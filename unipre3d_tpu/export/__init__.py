from unipre3d_tpu.export.torch_export import (export_state_dict,
                                              export_transformer_predictor,
                                              import_transformer_backbone,
                                              save_torch_checkpoint)
