"""Regenerate MULTICHIP_FLAGSHIP_AST_r{N}.json — the flagship-dims AST
multichip proof (round-4 verdict item 3: "refresh the flagship-AST
multichip artifact ... push the mesh leg past depth 1").

Runs ``__graft_entry__.dryrun_multichip_flagship_ast(n)`` in its scrubbed
CPU subprocess with ``AMUSE_FLAGSHIP_AST_FULL=1``: the mesh leg runs the
FULL depth-12 program (3 ViT-base encoders, 1214 tokens, 16 batched
reconstructions, fwd+bwd, grad psum) over a 2-device mesh — the
one-program proof, which subsumes the old single-device leg B. Per-leg
records arrive through the AMUSE_DRYRUN_JSONL side-channel (timings, peak
RSS, loss logs) and are assembled into the committed artifact.

~100 GB peak RSS / ~1 h of 1-core CPU (XLA CPU-backend memory retention,
not a model property — see the dryrun docstring). Run once per round on
the big-RAM host:

    python tools/multichip_flagship_ast.py --out MULTICHIP_FLAGSHIP_AST_r05.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="MULTICHIP_FLAGSHIP_AST_r05.json")
    ap.add_argument("--n-devices", type=int, default=8)
    ap.add_argument("--full", type=int, default=0,
                    help="1 = depth-12 mesh leg (AMUSE_FLAGSHIP_AST_FULL). "
                         "Measured r5: depth 12 x 2 quads OOMs the 125 GB "
                         "host; prefer --depth.")
    ap.add_argument("--depth", type=int, default=8,
                    help="mesh-leg depth (AMUSE_FLAGSHIP_AST_DEPTH): the "
                         "deepest-that-fits sharded proof; leg B still runs "
                         "full depth 12 single-device")
    args = ap.parse_args(argv)

    jsonl = Path(tempfile.mkstemp(prefix="flagship_ast_", suffix=".jsonl")[1])
    jsonl.write_text("")
    os.environ["AMUSE_DRYRUN_JSONL"] = str(jsonl)
    if args.full:
        os.environ["AMUSE_FLAGSHIP_AST_FULL"] = "1"
    elif args.depth:
        os.environ["AMUSE_FLAGSHIP_AST_DEPTH"] = str(args.depth)

    import __graft_entry__ as g

    rc = 0
    err = ""
    try:
        g.dryrun_multichip_flagship_ast(args.n_devices)
    except Exception as e:  # noqa: BLE001 - the artifact records the failure
        rc = 1
        err = str(e)[-2000:]

    legs = [json.loads(line) for line in jsonl.read_text().splitlines()]
    report = {
        "n_devices": args.n_devices,
        "rc": rc,
        "ok": rc == 0,
        "what": (
            f"dryrun_multichip_flagship_ast({args.n_devices}): stage-1 AST "
            "step at FLAGSHIP token/feature dims (fbank 1024x128 -> 1214 "
            "tokens, embed 768, 3 encoders, 16 batched reconstructions, "
            "fwd+bwd, grad psum) on the virtual CPU mesh. Leg A shards "
            f"depth {args.depth if not args.full else 12} over the mesh "
            "(deepest that fits the 125 GB host under XLA CPU-backend "
            "memory retention; depth 12 x 2 quads was measured to OOM); "
            "leg B runs the FULL depth-12 program single-device. All "
            "blocks are identical, so the sharded leg exercises every "
            "shape/padding/collective interaction of the full model."
        ),
    }
    if err:
        report["error"] = err
    for rec in legs:
        leg = rec.pop("leg")
        report[leg] = rec

    out = REPO / args.out if not Path(args.out).is_absolute() else Path(args.out)
    out.write_text(json.dumps(report, indent=1) + "\n")
    print(json.dumps({"ok": report["ok"], "legs": [r for r in report if r.startswith("leg_")]}))
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
