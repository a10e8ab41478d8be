#!/usr/bin/env python
"""HTTP synthesis server entry point — see facegantts_tpu/serve.py.

Usage:
  python serve.py port=8080 resume_from=<ckpt> vocoder_ckpt=<hifigan.pt> \
      test_faceimg=test/face.png warmup_buckets=1
"""

from facegantts_tpu.serve import main

if __name__ == "__main__":
    main()
