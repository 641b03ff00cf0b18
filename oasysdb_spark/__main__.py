"""``python -m oasysdb_spark`` — see :mod:`oasysdb_spark.cli`."""

import sys

from oasysdb_spark.cli import main

sys.exit(main())
