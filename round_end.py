"""Round-end artifact discipline (round-4 verdict item 8).

Run at the end of a build round to make the committed perf/parity
artifacts internally consistent:

    python round_end.py            # checks only (fast, no TPU)
    python round_end.py --run      # regenerate BENCH_DETAIL (--all sweep,
                                   # needs the chip) + dryrun first

Checks:
  1. BENCH_DETAIL.json row set == bench.py's --all registry
     (``all_benches``) — no stale/missing rows.
  2. Every ```name`` row cited in SCALING.md / PARITY.md / README.md
     exists in BENCH_DETAIL.json (docs can't cite rows the sweep
     doesn't carry).
  3. BENCH_DETAIL rows carry no "error" fields.
  4. __graft_entry__ imports and exposes entry / dryrun_multichip.

Exit 0 = consistent.  Each failure prints one line prefixed FAIL.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.abspath(__file__))


def _load_detail() -> dict:
    with open(os.path.join(ROOT, "BENCH_DETAIL.json")) as f:
        return json.load(f)


def _registry_names() -> set:
    # bench function name -> row name mapping is 1:1 via each result's
    # "name"; the registry check compares counts + detects rows whose
    # producing function no longer exists (by conventional prefix)
    import bench

    return {fn.__name__ for fn in bench.all_benches()}


def check_rows_match_registry() -> list:
    fails = []
    detail = _load_detail()
    rows = detail.get("configs", [])
    names = [r.get("name") for r in rows]
    if len(set(names)) != len(names):
        fails.append(f"FAIL duplicate rows in BENCH_DETAIL: {names}")
    n_reg = len(_registry_names())
    if len(rows) != n_reg:
        fails.append(
            f"FAIL BENCH_DETAIL carries {len(rows)} rows but bench.py's "
            f"--all registry has {n_reg} — regenerate with "
            f"`python bench.py --all` (python round_end.py --run)")
    for r in rows:
        if "error" in r:
            fails.append(f"FAIL bench row {r.get('name')!r} carries an "
                         f"error: {r['error']}")
    ns = detail.get("north_star") or {}
    if not ns or "error" in ns or not ns.get("value"):
        fails.append("FAIL BENCH_DETAIL.north_star missing or errored")
    return fails


def check_docs_cite_live_rows() -> list:
    fails = []
    detail = _load_detail()
    have = {r.get("name") for r in detail.get("configs", [])}
    # row names look like lowercase_with_underscores and appear in code
    # spans / tables; collect every doc token that matches a known row
    # naming pattern and require it to exist
    pat = re.compile(r"\b([a-z][a-z0-9]+(?:_[a-z0-9]+){2,})\b")
    known_prefixes = ("int8_", "e2e_", "dp_", "eval_", "tp_", "sp_",
                      "pp_", "moe_", "fsdp_", "vivit_", "distillation_",
                      "pipeline_", "p50_", "single_clip_", "pyramid_",
                      "two_modality_", "dropout", "adafactor_",
                      "decode_only_")
    # bench rows follow a naming convention; API identifiers that share
    # a prefix (tp_shard_block_params, moe_aux_weight, …) must not flag
    known_suffixes = ("_train", "_b32", "_b256", "_sp1", "_mp1", "_fwd",
                      "_host", "_logits", "_jpeg", "_png", "_mjpeg",
                      "_tokens")
    for doc in ("SCALING.md", "PARITY.md", "README.md"):
        path = os.path.join(ROOT, doc)
        if not os.path.exists(path):
            continue
        text = open(path).read()
        for tok in set(pat.findall(text)):
            if tok.startswith(known_prefixes) \
                    and tok.endswith(known_suffixes) and tok not in have \
                    and not any(tok.startswith(h + "_") or h.startswith(tok)
                                for h in have):
                fails.append(f"FAIL {doc} cites bench row {tok!r} absent "
                             f"from BENCH_DETAIL.json")
    return fails


def check_graft_entry() -> list:
    try:
        import __graft_entry__ as g

        assert callable(g.entry) and callable(g.dryrun_multichip)
        return []
    except Exception as e:   # noqa: BLE001
        return [f"FAIL __graft_entry__: {type(e).__name__}: {e}"]


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if "--run" in argv:
        print("round_end: dryrun_multichip(8) ...", flush=True)
        rc = subprocess.run([sys.executable, "-c",
                             "import __graft_entry__ as g; "
                             "g.dryrun_multichip(8)"], cwd=ROOT).returncode
        if rc != 0:
            print("FAIL dryrun_multichip rc", rc)
            return 1
        print("round_end: bench --all sweep (chip; this is long) ...",
              flush=True)
        rc = subprocess.run([sys.executable, "bench.py", "--all"],
                            cwd=ROOT).returncode
        if rc != 0:
            print("FAIL bench --all rc", rc)
            return 1
    fails = (check_rows_match_registry() + check_docs_cite_live_rows()
             + check_graft_entry())
    for f in fails:
        print(f)
    if not fails:
        print("round_end: all artifact checks pass")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
