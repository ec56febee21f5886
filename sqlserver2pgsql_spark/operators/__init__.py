from .cleanse import cleanse_strings
from .canonicalize import canonicalize
from .diff import DIFF_FLAG_COL, diff, diff_counts
from .merge import apply_diff
from .constraints import check_violations, fk_violations, pk_violations, unique_violations

__all__ = [
    "cleanse_strings",
    "canonicalize",
    "DIFF_FLAG_COL",
    "diff",
    "diff_counts",
    "apply_diff",
    "check_violations",
    "fk_violations",
    "pk_violations",
    "unique_violations",
]
