from .folder import ImageFolderIndex, build_dataset, split_dataset, scan_folder
from .sampler import epoch_batch_indices, ra_epoch_batch_indices
from .loader import DeviceLoader, decode_image
