"""``python -m marketpipe_spark`` entry point (reference: the ``marketpipe``
console script, src/marketpipe/cli/__init__.py)."""

import sys

from .cli import main

if __name__ == "__main__":
    sys.exit(main())
