"""Shared compiled-HLO census helpers (see inspect_trunk_hlo.py /
inspect_step_hlo.py).

Prints (a) the compiled module's memory analysis (temp allocation ~=
materialized intermediates) and (b) every ENTRY-computation instruction
whose output is >= min_mb -- fusion bodies are separate computations, so
ENTRY outputs are the tensors that actually hit HBM.
"""

from __future__ import annotations

import re

_BPE = {"f32": 4, "s32": 4, "u32": 4, "bf16": 2, "f16": 2,
        "s8": 1, "u8": 1, "pred": 1}


def census(compiled, min_mb: float = 8.0) -> None:
    try:
        print("== memory analysis ==")
        print(compiled.memory_analysis())
    except Exception as e:  # pragma: no cover - backend-dependent
        print("memory_analysis unavailable:", e)
    try:
        txt = compiled.as_text()
    except Exception as e:  # pragma: no cover
        print("compiled text unavailable:", e)
        return

    entry = txt[txt.rindex("ENTRY"):] if "ENTRY" in txt else txt
    print(f"\n== ENTRY instructions with outputs >= {min_mb} MB ==")
    rows = []
    for line in entry.splitlines():
        m = re.match(r"\s+\S+ = (\w+)\[([\d,]*)\]\S* ([\w-]+)\(", line)
        if not m:
            continue
        dt, dims, op = m.groups()
        bpe = _BPE.get(dt)
        if bpe is None or not dims:
            continue
        n = 1
        for d in dims.split(","):
            n *= int(d)
        size = n * bpe
        if size >= min_mb * (1 << 20):
            rows.append((size, f"{dt}[{dims}]", op))
    tot = 0
    agg = {}
    for size, shape, op in rows:
        key = (shape, op)
        c, s = agg.get(key, (0, 0))
        agg[key] = (c + 1, s + size)
        tot += size
    for (shape, op), (c, s) in sorted(agg.items(), key=lambda kv: -kv[1][1]):
        print(f"  {s / (1 << 20):8.1f} MB  {shape:28s} {op}  x{c}")
    print(f"  total >= {min_mb} MB entry outputs: {tot / (1 << 20):.1f} MB")

    print("\n== fusion kinds (entry) ==")
    kinds = {}
    for m in re.finditer(r"fusion\([^)]*\), kind=(\w+)", entry):
        kinds[m.group(1)] = kinds.get(m.group(1), 0) + 1
    print(kinds)
    print("entry convolution instructions:",
          len(re.findall(r" = \S+ convolution\(", entry)))
