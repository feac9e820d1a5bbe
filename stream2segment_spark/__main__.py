"""``python -m stream2segment_spark`` — the ``s2s`` CLI analogue."""

import sys

from stream2segment_spark.cli import main

sys.exit(main())
