"""`python -m geotrax_tpu` alias for the geotrax CLI."""

import sys

from geotrax_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main())
