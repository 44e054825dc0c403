"""Window functions: ranking, analytic, aggregates-over-window frames.

O9 (latest-partition/argmax, transform-service/main.py:89) generalizes
to row_number() OVER (... ORDER BY ... DESC) = 1 per SURVEY §2.2.
"""

from __future__ import annotations
