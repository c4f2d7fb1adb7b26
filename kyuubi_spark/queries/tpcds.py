"""TPC-DS representative slice re-expressed over the driver testdata schema.

Populated in round 2 — see registry ordering in ``__init__.py``.
"""

from __future__ import annotations
