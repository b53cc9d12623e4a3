"""Per-image lineage log.

The reference attaches an ``ImageLog`` to every image: an append-only
list of ``LogEntry(opType, opTool, opVal, opArgs, children)`` that is
JSON-serializable and merges by nesting child logs on binary ops
(reference: ImagePlusIO.scala:16-18,115 and merge at :175-183; op-type
enums Spiji.java:230-236).

Rebuild: the log is an ``array<struct>`` column; ``children_json``
JSON-encodes nested logs because Spark structs cannot recurse (the
reference JSON-encodes logs across the SQL boundary for the same
reason, PipUDT.scala:43).
"""

from __future__ import annotations

import json
from typing import Any

# Op types mirroring the reference's PIPOps / PIPTools enums
OP_CREATE = "CREATE"
OP_LOAD = "LOAD"
OP_RUN = "RUN"
OP_MERGE = "MERGE"
OP_OTHER = "OTHER"

TOOL_SPARK = "SPARK"
TOOL_NUMPY = "NUMPY"


def log_entry(
    optype: str,
    opval: str,
    opargs: list[str] | None = None,
    optool: str = TOOL_NUMPY,
    children: list[list[dict[str, Any]]] | None = None,
) -> dict[str, Any]:
    """Build one lineage entry (a row of LOG_ENTRY_SCHEMA)."""
    return {
        "optype": optype,
        "optool": optool,
        "opval": opval,
        "opargs": [str(a) for a in (opargs or [])],
        "children_json": json.dumps(children, default=_jsonable) if children else None,
    }


def _jsonable(o: Any):
    if hasattr(o, "tolist"):
        return o.tolist()
    return str(o)


def _aslist(log: Any) -> list:
    # accepts None, list, or numpy array (no bare truthiness on arrays)
    return [] if log is None else list(log)


def append_entry(
    log: list[dict[str, Any]] | None, entry: dict[str, Any]
) -> list[dict[str, Any]]:
    return [*(_norm(e) for e in _aslist(log)), entry]


def merge_logs(
    log_a: list[dict[str, Any]] | None,
    log_b: list[dict[str, Any]] | None,
    opval: str,
    opargs: list[str] | None = None,
) -> list[dict[str, Any]]:
    """Binary-op merge: a single MERGE entry whose children nest both
    parents' logs (reference shape tested by ImagePlusIOTests.scala:64-76)."""
    children = [[_norm(e) for e in _aslist(log_a)], [_norm(e) for e in _aslist(log_b)]]
    return [log_entry(OP_MERGE, opval, opargs, children=children)]


def _norm(e: Any) -> dict[str, Any]:
    if isinstance(e, dict):
        args = e.get("opargs")
        return {
            "optype": e.get("optype"),
            "optool": e.get("optool"),
            "opval": e.get("opval"),
            "opargs": [] if args is None else list(args),
            "children_json": e.get("children_json"),
        }
    # Row / namedtuple (opargs may be a numpy array — no truthiness)
    args = e.opargs
    return {
        "optype": e.optype,
        "optool": e.optool,
        "opval": e.opval,
        "opargs": [] if args is None else list(args),
        "children_json": e.children_json,
    }


def log_to_json(log: list[dict[str, Any]] | None) -> str:
    """Whole-log JSON dump (the reference round-trips logs through JSON,
    ImagePlusIOTests.scala:30-76)."""
    return json.dumps([_norm(e) for e in _aslist(log)], default=_jsonable)


def log_from_json(s: str) -> list[dict[str, Any]]:
    return [_norm(e) for e in json.loads(s)]
