from unipre3d_tpu.export.torch_export import (export_ptv3_backbone,
                                              export_scene_predictor,
                                              export_sparseunet_backbone,
                                              export_state_dict,
                                              export_transformer_predictor,
                                              import_ptv3_backbone,
                                              import_sparseunet_backbone,
                                              import_transformer_backbone,
                                              save_torch_checkpoint)
