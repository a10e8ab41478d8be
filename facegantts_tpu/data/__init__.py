from facegantts_tpu.data.dataset import (  # noqa: F401
    BucketedLoader,
    PackedDataset,
    SyntheticDataset,
    collate,
    load_packed,
)
