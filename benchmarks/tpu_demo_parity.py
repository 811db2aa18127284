"""Run the somatic demo on the REAL TPU backend and byte-compare both
output files against the reference's committed golden VCFs (the same
filterVariableMetadata normalization as tests/test_somatic_e2e.py).

This is the byte-parity gate for any TPU kernel change: the demo must
stay byte-identical through the Pallas scoring path. ~140s wall with a
warm compile cache; several minutes cold.
"""
from __future__ import annotations

import gzip
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EXPECTED_DIR = "/root/reference/src/demo/expectedResults"
VOLATILE = re.compile(
    r"^##(fileDate|source|source_version|startTime|reference|cmdline|"
    r"content)")


def lines(path):
    with gzip.open(path, "rt") as f:
        return [l for l in f if not VOLATILE.match(l)]


def main() -> int:
    import jax

    from strelka_tpu.workflow.somatic import run_somatic

    print(f"backend={jax.default_backend()}", file=sys.stderr)
    out = "/tmp/som_tpu_parity"
    import shutil
    shutil.rmtree(out, ignore_errors=True)
    rc = run_somatic([
        "--reference", "/root/reference/src/demo/data/demo20.fa",
        "--normal-align-file",
        "/root/reference/src/demo/data/NA12892_demo20.bam",
        "--tumor-align-file",
        "/root/reference/src/demo/data/NA12891_demo20.bam",
        "--output-dir", out, "--exome",
    ])
    if rc != 0:
        print("somatic run failed", file=sys.stderr)
        return 1
    ok = True
    for kind in ("snvs", "indels"):
        mine = lines(os.path.join(out, f"somatic.{kind}.vcf.gz"))
        exp = lines(os.path.join(EXPECTED_DIR, f"somatic.{kind}.vcf.gz"))
        same = mine == exp
        ok &= same
        print(f"{kind}: byte-identical={same} "
              f"({len(mine)} vs {len(exp)} lines)")
        if not same:
            for i, (a, b) in enumerate(zip(mine, exp)):
                if a != b:
                    print(f"  first diff at line {i}:\n  - {a!r}\n  + {b!r}")
                    break
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
