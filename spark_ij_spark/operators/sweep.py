"""Parameter sweep (grid search) — the rebuild of the reference's
``ParameterSweep`` + ``runRange`` surface as a Spark cross join.

Reference semantics (cited for parity, implementation is new):

- macro arg grammar ``-key=value -flag`` parsed per-delimiter
  (ParameterSweep.scala:86-92 ``parseArgsWithDelim``)
- start/end arg pairs expand to ``steps`` interpolated variants;
  **int-preserving**: a value that parses as a long interpolates on the
  integer lattice and deduplicates (ParameterSweep.scala:246-263)
- cartesian (``steps**k`` combos) or zipped (``steps`` combos) crossing
  (ParameterSweep.scala:292-317)
- sweep→path naming with static-arg elision
  (ParameterSweep.scala:137-176 ``SweepToPath``)
- ``runRange(cmd, startArgs, endArgs, steps)`` fans each image out to
  every sweep variant, key suffixed with the sweep path
  (scOps.scala:207-224)
- linear/log/fixed named ranges (ParameterSweep.scala:22-37)
- lineage-log → sweep-input helper (scOps.scala:165-175
  ``getLastCommandAsSweepInput``)

Spark-first shape: the sweep is a *small parameter table* cross-joined
(broadcast — it is tiny by construction) against the image DataFrame.
The fan-out therefore happens executor-side with zero shuffle: at 100 TB
each task reads its input split once and emits ``steps`` variants, and
Catalyst keeps the whole map in one stage.

Guard: cartesian expansion is capped (``max_variants``) so a runaway
sweep cannot OOM the driver building the parameter list (SURVEY.md
§7.3-6; the reference has no such guard).
"""

from __future__ import annotations

import math
import re
from collections.abc import Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spark_ij_spark import lineage
from spark_ij_spark.datamodel import IMAGE_SCHEMA, image_to_np, log_of, meta_of, np_to_image
from spark_ij_spark.registry import run_op

# ---------------------------------------------------------------------------
# macro-arg grammar
# ---------------------------------------------------------------------------

_LONG_RE = re.compile(r"^[+-]?\d+$")


def _is_long(s: str) -> bool:
    return bool(_LONG_RE.match(s.strip()))


def _is_double(s: str) -> bool:
    try:
        float(s)
        return True
    except ValueError:
        return False


def parse_args_with_delim(arg_list: str, delim: str = "-") -> dict[str, str]:
    """``"-radius=3 -white"`` → ``{"radius": "3", "white": "true"}``.

    Tokens split on ``delim``; a token without ``=`` maps to ``"true"``
    (flag). Mirrors the grammar of ParameterSweep.scala:86-92.
    """
    out: dict[str, str] = {}
    cleaned = re.sub(r"\s+", " ", arg_list).strip()
    if delim.isspace():
        toks = cleaned.split(delim)
    else:
        # the delimiter separates tokens only at a token BOUNDARY
        # (string start or after whitespace): a bare split corrupted
        # values containing the delimiter — '-size=0-Infinity' (the
        # exact form Analyze Particles consumes) became
        # {'size': '0', 'Infinity': 'true'} (round-8 review)
        toks = re.split(rf"(?:^|(?<=\s)){re.escape(delim)}", cleaned)
    for tok in toks:
        tok = tok.strip()
        if not tok:
            continue
        key, eq, val = tok.partition("=")
        out[key.strip()] = val.strip() if eq else "true"
    return out


def macro_parse_args(in_args: Sequence[str], delim: str = "-") -> dict[str, list[str]]:
    """Join k arg-strings into ``{key: [value per input, "false" fill]}``
    (ParameterSweep.scala:191-209)."""
    maps = [parse_args_with_delim(a, delim) for a in in_args]
    joined: dict[str, list[str]] = {}
    for i, m in enumerate(maps):
        for key, val in m.items():
            joined.setdefault(key, ["false"] * len(maps))[i] = val
    return joined


def _create_arg_str(key: str, arg: str, prefix: str) -> str:
    if arg == "true":
        return prefix + key
    if arg == "false":
        return ""
    return f"{prefix}{key}={arg}"


def _fmt_float(v: float) -> str:
    """Render like Scala's Float.toString for the common cases (no
    trailing .0 surprises: 2.0 stays "2.0", ints from float math too)."""
    f = float(f"{v:.7g}")  # float32-ish precision like the reference's .toFloat
    if f == int(f) and abs(f) < 1e15:
        return f"{f:.1f}"
    return repr(f)


def sweep_args(
    parsed: dict[str, list[str]],
    prefix: str = "",
    steps: int = 5,
    cartesian: bool = True,
    distinct: bool = True,
    max_variants: int = 10_000,
) -> list[str]:
    """Expand parsed start/end args into macro-arg variant strings
    (ParameterSweep.scala:228-317 semantics).

    Per key: constant ranges collapse; 2-point numeric ranges
    interpolate over ``steps`` (integers stay integers and dedupe);
    non-numeric ranges enumerate their distinct values. Then variants
    cross cartesian (product) or zipped (element-wise).
    """
    if steps < 2:
        raise ValueError("steps must be >= 2 (steps=1 midpoint is not a sweep)")

    var_args: dict[str, list[str]] = {}
    for key, rng in parsed.items():
        if all(v.lower() == rng[0].lower() for v in rng):
            var_args[key] = [rng[0]]
        elif distinct:
            var_args[key] = list(dict.fromkeys(rng))
        else:
            var_args[key] = list(rng)

    step_list = [i / (steps - 1.0) for i in range(steps)]
    arr_args: dict[str, list[str]] = {}
    for key, rng in var_args.items():
        if len(rng) == 2 and _is_long(rng[0]) and _is_long(rng[1]):
            lo, hi = float(rng[0]), float(rng[1])
            # round, not int(): truncating float noise made the
            # integer lattice direction-dependent (1..10 steps=4 gave
            # [1,3,6,10] but 10..1 gave [10,7,4,1] — round yields the
            # symmetric [1,4,7,10] either way)
            vals = [int(round(t * (hi - lo) + lo)) for t in step_list]
            arr_args[key] = [str(v) for v in dict.fromkeys(vals)]
        elif len(rng) == 2 and _is_double(rng[0]) and _is_double(rng[1]):
            lo, hi = float(rng[0]), float(rng[1])
            arr_args[key] = [_fmt_float(t * (hi - lo) + lo) for t in step_list]
        else:
            arr_args[key] = rng

    if not cartesian:
        # zipped crossing: every list must reach length == steps
        # (ParameterSweep.scala:266-290 block-padding). Runs at EVERY
        # steps value: gating it on steps != 2 let a constant key
        # (length-1 list) truncate the zip to one combo and silently
        # drop the other endpoint (round-8 review)
        padded: dict[str, list[str]] = {}
        for key, vals in arr_args.items():
            if len(vals) == steps:
                padded[key] = vals
            elif len(vals) == 2:
                half = steps // 2
                blk = [vals[0]] * half + [vals[1]] * half
                if steps % 2:
                    blk.append(vals[1])
                padded[key] = blk
            elif len(vals) == 1:
                padded[key] = vals * steps
            else:
                head = [vals[0]] * ((steps - len(vals)) // 2)
                blk = head + vals
                padded[key] = blk + [vals[-1]] * (steps - len(blk))
        arr_args = padded

    arg_str = {
        key: [_create_arg_str(key, v, prefix) for v in vals]
        for key, vals in arr_args.items()
    }

    if cartesian:
        combos: list[str] = []
        for variants in arg_str.values():
            if not variants:
                continue
            if not combos:
                combos = list(variants)
            else:
                if len(combos) * len(variants) > max_variants:
                    raise ValueError(
                        f"cartesian sweep exceeds max_variants={max_variants}; "
                        "use cartesian=False or raise the cap explicitly"
                    )
                combos = [f"{a} {b}" for a in combos for b in variants]
    else:
        lists = list(arg_str.values())
        combos = [" ".join(parts) for parts in zip(*lists)]

    return [re.sub(r"\s+", " ", c).strip() for c in combos]


def macro_steps_to_sweep(
    in_steps: Sequence[str],
    steps: int = 5,
    cartesian: bool = True,
    distinct: bool = True,
    delim: str = "-",
) -> list[str]:
    """start/end macro strings → sweep variant strings
    (ParameterSweep.scala:126-135)."""
    parsed = macro_parse_args(in_steps, delim)
    prefix = "-" if delim == "-" else ""
    return sweep_args(parsed, prefix, steps, cartesian, distinct)


def sweep_to_path(
    sweep_steps: Sequence[str],
    new_directories: bool = True,
    remove_static: bool = True,
    delim: str = "-",
) -> list[str]:
    """Variant strings → output-path suffixes, eliding args that never
    vary (ParameterSweep.scala:137-176)."""
    parsed = [parse_args_with_delim(s, delim) for s in sweep_steps]
    sweep_map: dict[str, list[str]] = {}
    for i, m in enumerate(parsed):
        for key, val in m.items():
            sweep_map.setdefault(key, ["false"] * len(sweep_steps))[i] = val
    if remove_static:
        sweep_map = {
            k: vals
            for k, vals in sweep_map.items()
            if not all(v.lower() == vals[0].lower() for v in vals)
        }
    arg_sep = "/" if new_directories else "__"
    out = []
    for i in range(len(sweep_steps)):
        out.append(arg_sep.join(f"{k}_{vals[i]}" for k, vals in sweep_map.items()))
    return out


# ---------------------------------------------------------------------------
# named ranges (ParameterSweep.scala:22-37 Parameters)
# ---------------------------------------------------------------------------


def linear_range(name: str, parameter: str, lo: float, hi: float, steps: int) -> list[tuple[str, str]]:
    """``steps`` equally spaced named parameters (endpoint-exclusive like
    the reference: i*(max-min)/steps + min)."""
    return fixed_range(name, parameter, [i * (hi - lo) / steps + lo for i in range(steps)])


def log_range(name: str, parameter: str, lo: float, hi: float, steps: int) -> list[tuple[str, str]]:
    llo, lhi = math.log10(lo), math.log10(hi)
    return fixed_range(
        name, parameter, [10 ** (i * (lhi - llo) / steps + llo) for i in range(steps)]
    )


def fixed_range(name: str, parameter: str, vals: Sequence[float]) -> list[tuple[str, str]]:
    """[(name:val, -parameter=val)] pairs (ParameterSweep.scala:35-37)."""
    return [(f"{name}:{v}", f"-{parameter}={v}") for v in vals]


# ---------------------------------------------------------------------------
# lineage → sweep input (scOps.scala:165-175)
# ---------------------------------------------------------------------------


def history_to_sweep(log: list) -> str:
    """Convert the last RUN entry of a lineage log into sweep input:
    ``cmd args`` → ``"cmd:arg1 cmd:arg2"`` (multiple RUN entries join
    with ``_``, mirroring getLastCommandAsSweepInput)."""
    runs = [e for e in (dict(x) if not isinstance(x, dict) else x for x in log or [])
            if e.get("optype") == lineage.OP_RUN]
    if not runs:
        raise ValueError("no RUN entries in lineage log")
    parts = []
    for e in runs:
        # the command lives in opval (lineage.log_entry stores the
        # TOOL enum in optool — reading optool here returned
        # 'NUMPY:...' for every engine-produced log, round-8 review)
        cmd = e.get("opval", "")
        args = " ".join(a for a in (e.get("opargs") or []) if a)
        toks = args.split() if args else []
        parts.append(" ".join(f"{cmd}:{t}" for t in toks) if toks else cmd)
    return "_".join(parts)


# ---------------------------------------------------------------------------
# Spark surface: runRange as a broadcast cross join
# ---------------------------------------------------------------------------


def run_op_with_args_col(image_col: str | Column, cmd: str, args_col: str | Column) -> Column:
    """Apply a named op whose arg string is a *column* (one value per
    sweep variant)."""

    @F.pandas_udf(IMAGE_SCHEMA)
    def _udf(img: pd.DataFrame, args: pd.Series) -> pd.DataFrame:
        rows = []
        for i, r in enumerate(img.itertuples(index=False)):
            a = str(args.iloc[i] or "")
            meta = meta_of(r)
            out, _ = run_op(image_to_np(r), cmd, a, meta)
            log = lineage.append_entry(
                log_of(r), lineage.log_entry(lineage.OP_RUN, cmd, [a])
            )
            rows.append(np_to_image(out, meta=meta, log=log))
        return pd.DataFrame(rows, columns=["data", "dtype", "shape", "meta", "log"])

    return _udf(image_col, args_col)


def run_range(
    df: DataFrame,
    cmd: str,
    start_args: str,
    end_args: str,
    steps: int = 5,
    image_col: str = "image",
    key_col: str = "sample",
    apply_op: bool = True,
) -> DataFrame:
    """Fan each image out to ``steps`` op variants (scOps.scala:207-224).

    Implemented as ``df CROSS JOIN broadcast(params)``: the parameter
    table is tiny by construction, so Spark plans a BroadcastNestedLoopJoin
    — no shuffle of the (large) image side, and the fan-out multiplies
    rows executor-side inside the same stage.
    """
    variants = macro_steps_to_sweep([start_args, end_args], steps=steps, delim=" ")
    paths = sweep_to_path(variants, new_directories=False, delim=" ")
    spark = df.sparkSession
    params = spark.createDataFrame(
        list(zip(variants, paths)), "_sweep_args string, _sweep_path string"
    )
    fanned = df.crossJoin(F.broadcast(params))
    out = fanned.withColumn(
        key_col, F.concat_ws("__", F.col(key_col), F.col("_sweep_path"))
    ).drop("_sweep_path")
    if not apply_op:
        # Fan-out only: the raw image and the ``_sweep_args`` column
        # survive so the caller can FUSE the op with its downstream
        # per-image computation in a single Arrow hop (op-fusion,
        # SURVEY §4.2) instead of paying one round trip per stage.
        return out
    return out.withColumn(
        image_col, run_op_with_args_col(image_col, cmd, F.col("_sweep_args"))
    ).drop("_sweep_args")
