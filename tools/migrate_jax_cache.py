"""Seed the current host's compile-cache directory after a machine hop.

The persistent XLA compilation cache is scoped per host-CPU fingerprint
(config._host_fingerprint): XLA:CPU entries are AOT-compiled for the exact
host ISA and crash (SIGILL/SIGSEGV in cpu_aot_loader) when loaded on a
machine with a different feature set, because the cache key does not include
host features. TPU entries, by contrast, are serialized for the accelerator
and survive host hops.

This tool scans legacy/other-host cache entries, classifies each by
decompressing it and looking for the XLA:CPU AOT markers (the compile-target
feature list and host triple), and HARD-LINKS the safe (non-CPU) entries
into the current host's directory so a migrated machine keeps its warm TPU
cache. CPU entries are left behind (unreachable under the new scoping).

Usage::

    python tools/migrate_jax_cache.py [--dry-run]
"""
from __future__ import annotations

import argparse
import os
import sys

_CPU_MARKERS = (b"prefer-no-gather", b"XLA:CPU", b"x86_64-")


def classify_is_cpu(path: str) -> bool:
    """True if the entry embeds an XLA:CPU AOT result (host-ISA-specific)."""
    import zstandard

    with open(path, "rb") as f:
        raw = f.read()
    try:
        data = zstandard.ZstdDecompressor().decompress(
            raw, max_output_size=1 << 30)
    except Exception:
        # Unreadable entry: treat as unsafe (do not migrate).
        return True
    return any(m in data for m in _CPU_MARKERS)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args()

    os.environ.setdefault("BOBE_TPU_NO_COMP_CACHE", "")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from bobe_tpu import config as cfg

    base = os.path.join(repo, ".jax_cache")
    dest = os.path.join(base, "hosts", cfg._host_fingerprint())
    os.makedirs(dest, exist_ok=True)

    # Source pools: the legacy flat layout and any other host's directory.
    sources = [base]
    hosts_dir = os.path.join(base, "hosts")
    if os.path.isdir(hosts_dir):
        sources += [os.path.join(hosts_dir, h) for h in os.listdir(hosts_dir)
                    if os.path.join(hosts_dir, h) != dest]

    migrated = skipped_cpu = present = failed = 0
    for src in sources:
        if not os.path.isdir(src):
            continue
        for name in os.listdir(src):
            sp = os.path.join(src, name)
            if not os.path.isfile(sp) or not name.endswith("-cache"):
                continue
            dp = os.path.join(dest, name)
            if os.path.exists(dp):
                present += 1
                continue
            try:
                if classify_is_cpu(sp):
                    skipped_cpu += 1
                    continue
                if not args.dry_run:
                    os.link(sp, dp)
                migrated += 1
            except Exception as e:
                failed += 1
                print(f"  ! {name}: {e}", file=sys.stderr)
    print(f"dest={dest}")
    print(f"migrated={migrated} skipped_cpu={skipped_cpu} "
          f"already_present={present} failed={failed}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
