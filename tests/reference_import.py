"""Make the (read-only) upstream reference importable for golden tests.

Used ONLY to generate golden outputs from identical weights — the reference
is the behavioral spec, never a code source.
"""

import sys

REFERENCE_ROOT = "/root/reference"

if REFERENCE_ROOT not in sys.path:
    sys.path.insert(0, REFERENCE_ROOT)
