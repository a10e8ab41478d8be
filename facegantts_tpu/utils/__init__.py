from facegantts_tpu.utils.audio import load_wav, save_wav  # noqa: F401
