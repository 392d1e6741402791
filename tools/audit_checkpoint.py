#!/usr/bin/env python
"""Pre-flight audit of a downloaded checkpoint against a pinned manifest.

Run BEFORE pointing the CLIs at real weights: header-only (safetensors
8-byte header JSON, sharded dirs via *.safetensors.index.json) so a
multi-GB checkpoint audits in milliseconds, and a mismatched or
half-downloaded checkpoint fails loudly instead of silently degrading
into random-init behavior (reference load sites:
models/wan/textimage2video.py:103, models/BAGEL/eval_understanding.py:
485-493).

Usage:
  python tools/audit_checkpoint.py --ckpt <file-or-dir> \
      --manifest <name under manifests/ | path to a manifest json>
  python tools/audit_checkpoint.py --list      # available manifests

Prints one JSON line: {"ok": bool, "missing": n, "unexpected": n,
"shape_mismatch": n, "first": {...}} and exits non-zero on mismatch.
"""

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
MANIFEST_DIR = os.path.join(REPO, "manifests")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", help="checkpoint file or directory")
    p.add_argument("--manifest",
                   help="manifest name under manifests/ (e.g. "
                        "wan_ti2v-5B_dit) or a path to a manifest json")
    p.add_argument("--list", action="store_true",
                   help="list pinned manifests and exit")
    args = p.parse_args()

    if args.list:
        names = sorted(f[:-5] for f in os.listdir(MANIFEST_DIR)
                       if f.endswith(".json"))
        print(json.dumps({"manifests": names}))
        return
    if not args.ckpt or not args.manifest:
        p.error("--ckpt and --manifest are required (or --list)")

    from univid_tpu.core.checkpoint import audit_checkpoint
    from univid_tpu.core.manifest import load_manifest

    mpath = args.manifest if os.path.exists(args.manifest) else \
        os.path.join(MANIFEST_DIR, args.manifest + ".json")
    manifest = load_manifest(mpath)
    diff = audit_checkpoint(args.ckpt, manifest)
    ok = not any(diff.values())
    print(json.dumps({
        "ok": ok,
        "manifest": os.path.basename(mpath),
        "keys_expected": len(manifest),
        "missing": len(diff["missing"]),
        "unexpected": len(diff["unexpected"]),
        "shape_mismatch": len(diff["shape_mismatch"]),
        "first": {k: v[:3] for k, v in diff.items() if v},
    }))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
