from focnerf_tpu.data.provider import NeRFDataset, DatasetOptions
