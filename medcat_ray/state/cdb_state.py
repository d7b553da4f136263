"""CDB training-state capture / restore (SURVEY utility gap; reference
/root/reference/medcat/utils/cdb_state.py:16-140 — kfold regression and
what-if training wrap a CDB mutation in a save→train→restore cycle).

State fields = the maps (supervised) training mutates.  Reference
serializes with dill; here in-memory deep copies or a pickle file (the CDB
is model-sized) — same ``captured_state_cdb`` context-manager contract.
"""

from __future__ import annotations

import contextlib
import copy
import os
import pickle
import tempfile
from typing import Dict

# fields training mutates (reference CDBState TypedDict, cdb_state.py:16-26)
STATE_FIELDS = ("name2cuis", "snames", "cui2names", "cui2snames",
                "cui2context_vectors", "cui2count_train", "name_isupper",
                "vocab")


def copy_cdb_state(cdb) -> Dict:
    """Deep copy of the training-mutable state (reference copy_cdb_state)."""
    return {k: copy.deepcopy(getattr(cdb, k)) for k in STATE_FIELDS}


def save_cdb_state(cdb, file_path: str) -> None:
    """Serialize the state (no copy first — reference parity,
    cdb_state.py:62-79)."""
    with open(file_path, "wb") as fh:
        pickle.dump({k: getattr(cdb, k) for k in STATE_FIELDS}, fh)


def apply_cdb_state(cdb, state: Dict) -> None:
    for k, v in state.items():
        setattr(cdb, k, v)


def load_and_apply_cdb_state(cdb, file_path: str) -> None:
    """Free the live state, then load from disk (memory-peak-avoiding
    order — reference cdb_state.py:93-118)."""
    for k in STATE_FIELDS:
        setattr(cdb, k, None)
    with open(file_path, "rb") as fh:
        data = pickle.load(fh)
    for k in STATE_FIELDS:
        setattr(cdb, k, data[k])


@contextlib.contextmanager
def captured_state_cdb(cdb, save_state_to_disk: bool = False):
    """Capture the CDB state on entry, restore it on exit (reference
    captured_state_cdb, cdb_state.py:121-140): train inside the block,
    leave the CDB as it was."""
    if save_state_to_disk:
        fd, path = tempfile.mkstemp(suffix=".cdbstate.pkl")
        os.close(fd)
        try:
            save_cdb_state(cdb, path)
            yield
            load_and_apply_cdb_state(cdb, path)
        finally:
            os.unlink(path)
    else:
        state = copy_cdb_state(cdb)
        try:
            yield
        finally:
            apply_cdb_state(cdb, state)
