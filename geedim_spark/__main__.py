"""``python -m geedim_spark`` — chained CLI entrypoint (see cli.py)."""

from geedim_spark.cli import main

raise SystemExit(main())
