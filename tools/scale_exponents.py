"""Per-key sf0.1 -> sf0.2 scale exponents (VERDICT r12 item 2).

Reads two bench reps files (append-only jsonl written by bench.py) —
one recorded at sf0.1 and one at sf0.2 — takes the per-key MINIMUM
across reps at each SF (the min is the least-contended observation on
a bimodal host; medians mix in degraded-window reps and fake
super-linear exponents), and reports

    exponent = log(t_sf02 / t_sf01) / log(2)

for both cold and warm runs. exponent 1.0 = linear in data size,
< 1 = sub-linear (fixed overhead amortizing), > 1.2 = flagged for
plan audit per the verdict's threshold.

Keys faster than FLOOR_SEC at sf0.1 are reported but not flagged:
a 0.4 s -> 0.9 s move is JVM/session noise arithmetic, not a scale
signal (the exponent of two numbers inside the startup-jitter band
is meaningless).

Usage: python tools/scale_exponents.py SF01_REPS SF02_REPS [--json]
"""

from __future__ import annotations

import json
import math
import sys

FLOOR_SEC = 2.0
FLAG_EXPONENT = 1.2


def load_reps(path: str) -> tuple[dict[str, float], dict[str, float]]:
    """Per-key min across all reps in the file, cold and warm."""
    cold: dict[str, float] = {}
    warm: dict[str, float] = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            rec = json.loads(line)
            for dst, field in ((cold, "queries"), (warm, "queries_warm")):
                for k, v in rec.get(field, {}).items():
                    if not isinstance(v, (int, float)):
                        continue
                    if k not in dst or v < dst[k]:
                        dst[k] = v
    return cold, warm


def exponent(t1: float | None, t2: float | None) -> float | None:
    if not t1 or not t2 or t1 <= 0 or t2 <= 0:
        return None
    return math.log(t2 / t1) / math.log(2.0)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    as_json = "--json" in sys.argv
    sf01_path, sf02_path = args[0], args[1]
    c1, w1 = load_reps(sf01_path)
    c2, w2 = load_reps(sf02_path)

    rows = []
    for key in sorted(set(c1) | set(c2)):
        ec = exponent(c1.get(key), c2.get(key))
        ew = exponent(w1.get(key), w2.get(key))
        flagged = (
            ec is not None
            and ec > FLAG_EXPONENT
            and c1.get(key, 0.0) >= FLOOR_SEC
        )
        rows.append({
            "key": key,
            "sf01_cold": c1.get(key),
            "sf02_cold": c2.get(key),
            "exp_cold": None if ec is None else round(ec, 2),
            "sf01_warm": w1.get(key),
            "sf02_warm": w2.get(key),
            "exp_warm": None if ew is None else round(ew, 2),
            "flagged": flagged,
        })
    rows.sort(key=lambda r: (r["exp_cold"] is None, -(r["exp_cold"] or 0)))

    if as_json:
        print(json.dumps(rows))
        return
    print("| key | sf0.1 cold | sf0.2 cold | exp | sf0.1 warm | "
          "sf0.2 warm | exp | flag |")
    print("|---|---|---|---|---|---|---|---|")
    for r in rows:
        def fmt(x):
            return "—" if x is None else f"{x:.2f}"
        print(f"| {r['key']} | {fmt(r['sf01_cold'])} | {fmt(r['sf02_cold'])}"
              f" | {fmt(r['exp_cold'])} | {fmt(r['sf01_warm'])} | "
              f"{fmt(r['sf02_warm'])} | {fmt(r['exp_warm'])} | "
              f"{'FLAG' if r['flagged'] else ''} |")
    flagged = [r["key"] for r in rows if r["flagged"]]
    n = sum(1 for r in rows if r["exp_cold"] is not None)
    print(f"\n{n} keys with both-SF cold records; "
          f"{len(flagged)} flagged (> {FLAG_EXPONENT} above {FLOOR_SEC}s "
          f"floor): {flagged}")


if __name__ == "__main__":
    main()
