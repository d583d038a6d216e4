"""``python -m linkpred_tpu`` — experiment driver entry point."""
import sys

from .cli import main

sys.exit(main())
