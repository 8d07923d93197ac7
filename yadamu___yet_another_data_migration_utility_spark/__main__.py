"""``python -m yadamu___yet_another_data_migration_utility_spark <verb>``
-- the reference's CLI workflow (yadamuCLI.js) over this engine."""

import sys

from .cli import main

sys.exit(main())
