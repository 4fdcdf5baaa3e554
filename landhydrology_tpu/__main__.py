"""``python -m landhydrology_tpu`` — config-file simulation driver."""

from landhydrology_tpu.cli import main

raise SystemExit(main())
