"""``python -m aad_tpu`` runs the CLI."""

import sys

from .cli import main

sys.exit(main())
