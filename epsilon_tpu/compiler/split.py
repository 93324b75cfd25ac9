"""Split transform — intentionally disabled, mirroring the reference.

The reference defines a pass that would split Kronecker-producing linear-map
chains via epigraph variables but comments it out of the pipeline
(``compiler/compiler.py:9-10``, ``transforms/split.py:11-24``).  Kept here as
an explicit no-op for inventory parity; enable by adding it to
``compiler.compile_problem`` if Kronecker-heavy problems need splitting.
"""

from __future__ import annotations

from typing import List

from .prox_rules import PendingTerm


def transform_terms(terms: List[PendingTerm]) -> List[PendingTerm]:
    """No-op (disabled upstream)."""
    return terms
