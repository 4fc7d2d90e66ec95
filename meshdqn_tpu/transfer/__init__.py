from .interpolate import (
    SnapshotSet,
    SnapshotTransfer,
    SourceField,
    eval_p1,
    eval_p2_vector,
    locate,
)

__all__ = [
    "SnapshotSet",
    "SnapshotTransfer",
    "SourceField",
    "eval_p1",
    "eval_p2_vector",
    "locate",
]
