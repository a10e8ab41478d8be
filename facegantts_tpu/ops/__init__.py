from facegantts_tpu.ops.align import (  # noqa: F401
    duration_loss,
    fix_len_compatibility,
    generate_path,
    sequence_mask,
)
from facegantts_tpu.ops.mas import maximum_path, maximum_path_numpy  # noqa: F401
from facegantts_tpu.ops.mel import mel_filterbank, mel_spectrogram, num_mel_frames  # noqa: F401
