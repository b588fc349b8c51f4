"""`python -m neurosis_tpu` (parity: __main__.py:1-5)."""

import sys

from neurosis_tpu.trainer.cli import main

sys.exit(main())
