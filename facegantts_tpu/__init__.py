"""face-gan-tts-tpu: TPU-native face-conditioned adversarial-diffusion TTS.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
CognitiveModeling/Face-GAN-TTS reference (text+face -> mel via score-based
diffusion with optional spectrogram-discriminator GAN training, vocoded to
16 kHz waveform), designed TPU-first: functional Flax modules, one jitted
train step, static bucketed shapes, shard_map data parallelism over an ICI
mesh, and on-device monotonic alignment search.
"""

__version__ = "0.1.0"

from facegantts_tpu.config import Config, default_config  # noqa: F401
