"""Named-operation registry — the rebuild of the reference's plugin
dispatch.

The reference resolves command strings ("Add Noise", "Median...") to
ImageJ plugins at run time (reference: PortableImagePlus.scala:352-388,
Spiji.java:1391-1412) and lists >100 available commands
(DDLTests.scala:34 asserts the count). The rebuild replaces the plugin
menu with a plain dict ``{name: kernel}``; kernels are numpy functions
executed inside Arrow pandas UDFs, so per-partition engine warm-up
(scOps.scala:41, ImageJSettings.scala:51-62) becomes ordinary Python
module-import caching on each executor.

Unknown command names raise with near-match suggestions.

Kernel contract::

    kernel(arr: np.ndarray, args: dict, meta: dict)
        -> np.ndarray | (np.ndarray, results_table dict[str, list[float]])

Arg strings use the ImageJ macro grammar (``radius=3 white clear``):
``k=v`` pairs plus bare flags (parsed like ParameterSweep.scala:86-92).
"""

from __future__ import annotations

import difflib
import re
import shlex
from collections.abc import Callable
from typing import Any

import numpy as np

OPS: dict[str, Callable] = {}


def register_op(name: str) -> Callable:
    """Decorator: add a kernel to the registry under ``name``."""

    def deco(fn: Callable) -> Callable:
        OPS[name] = fn
        return fn

    return deco


def get_op(name: str) -> Callable:
    _ensure_loaded()  # bare get_op in a fresh process must see the menu
    try:
        return OPS[name]
    except KeyError:
        near = difflib.get_close_matches(name, OPS.keys(), n=3, cutoff=0.4)
        hint = f"; did you mean {near}?" if near else ""
        raise KeyError(f"unknown operation {name!r}{hint} ({len(OPS)} registered)")


def list_commands() -> list[str]:
    """All registered command names (SQL ``listcommands()``,
    reference: SQLFunctions.scala:264-268)."""
    _ensure_loaded()
    return sorted(OPS)


def _ensure_loaded() -> None:
    # Kernels self-register on import; keep the import here so any entry
    # point (SQL UDF, DataFrame helper, bare get_op) sees the full menu.
    from spark_ij_spark.kernels import core  # noqa: F401
    from spark_ij_spark.kernels import filters  # noqa: F401
    from spark_ij_spark.kernels import geometry  # noqa: F401
    from spark_ij_spark.kernels import menu  # noqa: F401
    from spark_ij_spark.kernels import particles  # noqa: F401


def parse_args(args: str | None) -> dict[str, Any]:
    """ImageJ macro-style arg string → dict.

    ``"radius=3 white clear method=IsoData"`` →
    ``{"radius": "3", "white": True, "clear": True, "method": "IsoData"}``

    Bracketed multi-word values — the form the ImageJ macro recorder
    actually emits, ``projection=[Max Intensity]`` — are normalized to
    quoted form before tokenizing, so recorded macros replay verbatim.
    """
    out: dict[str, Any] = {}
    if not args:
        return out
    args = re.sub(
        r'=\[([^\]]*)\]',
        lambda m: '="' + m.group(1).replace('"', '\\"') + '"',
        args,
    )
    try:
        tokens = shlex.split(args)
    except ValueError:
        tokens = args.split()
    for tok in tokens:
        if "=" in tok:
            k, _, v = tok.partition("=")
            out[k] = v
        else:
            out[tok] = True
    return out


def get_float(args: dict[str, Any], key: str, default: float) -> float:
    v = args.get(key)
    if v is None or v is True:
        return default
    return float(v)


def get_int(args: dict[str, Any], key: str, default: int) -> int:
    return int(round(get_float(args, key, float(default))))


def run_op(
    arr: np.ndarray, cmd: str, args: str | None = None, meta: dict | None = None
) -> tuple[np.ndarray, dict[str, list[float]] | None]:
    """Dispatch one named op on an array; returns (result, results_table).

    The threshold special-case mirrors PortableImagePlus.scala:366-377:
    ``setThreshold``/``applyThreshold`` parse lower/upper with
    min/max-infinity defaults before dispatch.
    """
    _ensure_loaded()
    kernel = get_op(cmd)
    parsed = parse_args(args)
    # meta is mutated IN PLACE: stateful ops (setThreshold, LUT
    # selection) stash into it and the caller writes it to the output
    # image, so a copy here would silently drop the stash between
    # chained ops.
    out = kernel(np.asarray(arr), parsed, meta if meta is not None else {})
    if isinstance(out, tuple):
        return out[0], out[1]
    return out, None
