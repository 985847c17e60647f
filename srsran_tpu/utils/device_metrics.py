"""Per-block DEVICE time metrics from the XLA profiler.

Analogue of the reference's per-block metric decorators
(lib/phy/metrics/phy_metrics_*_decorator.h, 21 headers) and the aggregators
that consume them (lib/phy/upper/metrics/aggregators/).  The reference wraps
every PHY block in a decorator that timestamps each call; that is meaningless
inside one fused XLA program, so the TPU-native pipeline is:

1.  Block boundaries are marked with ``jax.named_scope("<block>")`` in the
    slot programs (phy/slot_programs.py, phy/upper/pusch.py, ...).  The scope
    lands in every HLO instruction's ``metadata={op_name="jit(f)/<block>/..."}``.
2.  A ``jax.profiler`` capture of a running slot yields per-HLO-op device
    durations (trace events carry ``args.hlo_op``).
3.  ``profile_blocks`` joins (2) against the compiled module's metadata (1)
    and aggregates device-time per block — the same per-block report the
    reference prints, measured on the device timeline instead of host clocks.

Fused ops are attributed to the scope of their metadata representative (XLA
keeps one op_name per fusion); ops with no scope fall under "<other>".
"""

from __future__ import annotations

import glob
import gzip
import json
import re
import tempfile

# metadata={... op_name="jit(fn)/scope/sub/op" ...} on an HLO instruction
# line "  %name.1 = f32[...] op(...), metadata={...}".
_INSTR_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s.*metadata=\{[^}]*op_name=\"([^\"]+)\"")


def scope_map(hlo_text: str) -> dict:
    """Map HLO instruction name -> named_scope path (from op_name metadata).

    op_name looks like ``jit(f)/scopeA/scopeB/primitive``; the returned scope
    is the path between the jit(...) prefix and the primitive, or "<other>"
    when the instruction carries no user scope.
    """
    out = {}
    for line in hlo_text.splitlines():
        m = _INSTR_RE.match(line)
        if not m:
            continue
        instr, op_name = m.groups()
        parts = op_name.split("/")
        if parts and parts[0].startswith("jit("):
            parts = parts[1:]
        scope = "/".join(parts[:-1]) if len(parts) > 1 else "<other>"
        out[instr] = scope or "<other>"
    return out


def _load_trace_events(log_dir: str) -> list:
    evs = []
    for path in glob.glob(log_dir + "/**/*.trace.json.gz", recursive=True):
        data = json.loads(gzip.open(path).read())
        evs.extend(e for e in data.get("traceEvents", [])
                   if e.get("ph") == "X")
    return evs


def aggregate(events: list, scopes: dict) -> dict:
    """Sum device durations per scope: {scope: {"time_us", "ops", "calls"}}.

    CPU traces tag device ops with args.hlo_op; TPU traces (tunnelled xplane)
    carry the HLO instruction name as the event name with no args — both are
    matched against the compiled module's scope map.  Events whose name does
    not resolve to an HLO instruction (host-side spans) are dropped.
    """
    agg: dict = {}
    for e in events:
        op = e.get("args", {}).get("hlo_op") or e.get("name", "")
        if not op or op.startswith(("end:", "$")):
            continue
        scope = scopes.get(op)
        if scope is None:
            # fusion sub-ops appear as "fusion.N" variants; retry the stem
            scope = scopes.get(op.split(".")[0])
        if scope is None:
            if "hlo_op" not in e.get("args", {}):
                continue  # unmatched host event
            scope = "<other>"
        a = agg.setdefault(scope, {"time_us": 0.0, "ops": set(), "calls": 0})
        a["time_us"] += float(e.get("dur", 0.0))
        a["ops"].add(op)
        a["calls"] += 1
    for a in agg.values():
        a["ops"] = len(a["ops"])
    return agg


def profile_blocks(jitted_fn, *args, warmup: int = 1, iters: int = 1,
                   log_dir: str | None = None, **kwargs) -> dict:
    """Run ``jitted_fn(*args)`` under the profiler; per-block device times.

    Returns {scope: {"time_us": total device us across iters, "ops": #distinct
    HLO ops, "calls": #op executions}}.  ``time_us`` divided by ``iters`` is
    the per-slot device cost of that block.
    """
    import jax

    hlo = jitted_fn.lower(*args, **kwargs).compile().as_text()
    scopes = scope_map(hlo)
    for _ in range(warmup):
        jax.block_until_ready(jitted_fn(*args, **kwargs))
    d = log_dir or tempfile.mkdtemp(prefix="srsran_tpu_prof_")
    jax.profiler.start_trace(d, create_perfetto_trace=True)
    try:
        for _ in range(iters):
            out = jitted_fn(*args, **kwargs)
        jax.block_until_ready(out)
    finally:
        jax.profiler.stop_trace()
    return aggregate(_load_trace_events(d), scopes)


def report_lines(agg: dict, iters: int = 1) -> list:
    """Human-readable per-block table, largest first (aggregator style)."""
    total = sum(a["time_us"] for a in agg.values()) or 1.0
    lines = []
    for scope, a in sorted(agg.items(), key=lambda kv: -kv[1]["time_us"]):
        us = a["time_us"] / iters
        lines.append(f"{scope:<40s} {us:>10.1f} us/iter "
                     f"{100.0 * a['time_us'] / total:>5.1f}%  "
                     f"({a['ops']} ops, {a['calls']} execs)")
    return lines
