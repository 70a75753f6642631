from unipre3d_tpu.utils import camera, sh, losses
