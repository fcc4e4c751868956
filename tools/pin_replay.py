#!/usr/bin/env python3
"""Pin-shrink probe (r12 verdict #5): try the BASE (tier-independent)
SQL oracles at a derived tier for rows currently served by generated
literal pins. Any row whose base oracle both finishes inside the
budget AND hash-matches the engine dump at that tier no longer needs
its pin — the oracle RECOMPUTES there, so the pin can be dropped from
the overlay, reserving pins for the documented-quadratic ground truths
and the seeded reproducibility contracts.

Same per-row isolated comparison as tools/sweep_check.py, but the SQL
comes from a caller-supplied oracle json (the sf0.01 dump's
oracle_sql.json, i.e. WITHOUT the tier overlay applied).

Usage: pin_replay.py <sfDir> <dumpDir> <baseOracleJson> [budget] [names...]
"""
import json
import multiprocessing as mp
import sys

import sweep_check


def main():
    sf_dir, dump_dir, oracle_path = sys.argv[1], sys.argv[2], sys.argv[3]
    budget = int(sys.argv[4]) if len(sys.argv) > 4 else 240
    names = sys.argv[5:]
    oracle = json.load(open(oracle_path))
    droppable, keep = [], []
    for name in names:
        if name not in oracle:
            print(json.dumps({"name": name, "skipped": "no base oracle"}))
            keep.append(name)
            continue
        q = mp.Queue()
        p = mp.Process(target=sweep_check.check_one,
                       args=(sf_dir, dump_dir, name, oracle[name], q))
        p.start()
        p.join(budget)
        if p.is_alive():
            p.terminate()
            p.join()
            res = {"name": name, "hash_match": False,
                   "err": f"base oracle exceeded {budget}s budget"}
        else:
            res = q.get() if not q.empty() else {
                "name": name, "hash_match": False, "err": "child died"}
        print(json.dumps(res), flush=True)
        (droppable if res.get("hash_match") else keep).append(name)
    print(f"DROPPABLE ({len(droppable)}): " + " ".join(sorted(droppable)))
    print(f"KEEP PINNED ({len(keep)}): " + " ".join(sorted(keep)))


if __name__ == "__main__":
    main()
