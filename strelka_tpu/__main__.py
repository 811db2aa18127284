"""Top-level CLI dispatcher.

Reference analog: the configureStrelka*Workflow.py entry scripts.

  python -m strelka_tpu germline --reference ... --align-file ...
  python -m strelka_tpu somatic --reference ... --normal-align-file ...
  python -m strelka_tpu denovo --proband ... --mother ... --father ...
  python -m strelka_tpu noise-extractor --reference ... --align-file ...
  python -m strelka_tpu tools <cmd> ...
"""
from __future__ import annotations

import sys


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        return 0
    cmd, rest = argv[0], argv[1:]
    if cmd == "germline":
        from .workflow.germline import run_germline
        return run_germline(rest)
    if cmd == "somatic":
        from .workflow.somatic import run_somatic
        return run_somatic(rest)
    if cmd == "denovo":
        from .workflow.denovo import run_denovo
        return run_denovo(rest)
    if cmd == "noise-extractor":
        from .workflow.noise_extractor import run_noise_extractor
        return run_noise_extractor(rest)
    if cmd == "tools":
        from .workflow.tools import main as tools_main
        return tools_main(rest)
    print(f"unknown command: {cmd}\n{__doc__}", file=sys.stderr)
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
