"""``python -m pgsink_spark`` → the CLI (see pgsink_spark/cli.py)."""

import sys

from pgsink_spark.cli import main

sys.exit(main())
