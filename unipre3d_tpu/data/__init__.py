from unipre3d_tpu.data.dataset_factory import get_dataset
from unipre3d_tpu.data.loader import Loader
