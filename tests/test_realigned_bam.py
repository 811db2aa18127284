"""--output-realigned-bam: record preservation + realignment CIGARs."""
import numpy as np

from strelka_tpu.io.bam import read_bam


def test_realigned_bam_roundtrip(tmp_path):
    from strelka_tpu.workflow.germline import run_germline

    out = str(tmp_path / "run")
    rc = run_germline([
        "--reference", "/root/reference/src/demo/data/demo20.fa",
        "--align-file", "/root/reference/src/demo/data/NA12891_demo20.bam",
        "--output-dir", out, "--exome", "--output-realigned-bam"])
    assert rc == 0
    _, orig = read_bam("/root/reference/src/demo/data/NA12891_demo20.bam")
    _, re_b = read_bam(out + "/realigned.S1.bam")
    # every record preserved, coordinate-sorted
    assert re_b.n == orig.n
    assert bool((re_b.pos[1:] >= re_b.pos[:-1]).all())
    # the demo's TAT insertion and 1bp deletion appear in realigned
    # CIGARs
    n_ins = n_del = 0
    for r in range(re_b.n):
        ops, lens = re_b.get_cigar(r)
        if ((ops == 1) & (lens == 3)).any():
            n_ins += 1
        if ((ops == 2) & (lens == 1)).any():
            n_del += 1
    assert n_ins >= 5, n_ins
    assert n_del >= 10, n_del
    # base payloads unchanged (realignment rewrites placement only)
    assert int(re_b.seq_off[-1]) == int(orig.seq_off[-1])


def test_somatic_realigned_bam_output(tmp_path):
    """--output-realigned-bam on the somatic workflow writes
    realigned.normal.bam / realigned.tumor.bam with realignment-updated
    CIGARs (reference --realigned-read-file)."""
    from strelka_tpu.io.bam import read_bam
    from strelka_tpu.workflow.somatic import run_somatic

    out = str(tmp_path / "som_rbam")
    rc = run_somatic([
        "--reference", "/root/reference/src/demo/data/demo20.fa",
        "--normal-align-file",
        "/root/reference/src/demo/data/NA12892_demo20.bam",
        "--tumor-align-file",
        "/root/reference/src/demo/data/NA12891_demo20.bam",
        "--output-dir", out, "--exome", "--output-realigned-bam"])
    assert rc == 0
    import numpy as np

    from strelka_tpu.utils import cigar as cg
    for label, src in (("normal",
                        "/root/reference/src/demo/data/NA12892_demo20.bam"),
                       ("tumor",
                        "/root/reference/src/demo/data/NA12891_demo20.bam")):
        hdr, rb = read_bam(f"{out}/realigned.{label}.bam")
        _h, orig = read_bam(src)
        assert rb.n == orig.n
        assert hdr.ref_names == ["demo20"]
    # the tumor carries 8 TAT-insertion-supporting reads: realignment
    # must embed insertions into some tumor CIGARs
    _h, tb = read_bam(f"{out}/realigned.tumor.bam")
    has_ins = any(cg.INSERT in tb.get_cigar(r)[0] for r in range(tb.n))
    assert has_ins
