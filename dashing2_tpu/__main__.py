"""`python -m dashing2_tpu` == the dashing2-tpu CLI."""

import sys

from .cli import main

sys.exit(main())
