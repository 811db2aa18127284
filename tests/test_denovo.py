"""De novo trio scoring tests (deNovoQualityScore/denovo.py analog)."""
import numpy as np
import pytest

from strelka_tpu.workflow.denovo import denovo_posterior, transmission_matrix


def test_transmission_matrix():
    t = transmission_matrix(mu=0)
    # homref x homref -> child homref
    assert t[0, 0, 0] == 1.0
    # het x het -> 1/4, 1/2, 1/4
    np.testing.assert_allclose(t[1, 1], [0.25, 0.5, 0.25])
    # homalt x homref -> child het
    assert t[2, 0, 1] == 1.0
    # rows sum to 1
    np.testing.assert_allclose(t.sum(axis=2), 1.0)


def test_denovo_detection():
    # confident het child, confident homref parents -> de novo
    child_pl = [[200, 0, 200]]
    parent_pl = [[0, 200, 400]]
    p = denovo_posterior(child_pl, parent_pl, parent_pl)
    assert p[0] > 0.99
    # inherited het (mother het) -> not de novo
    mother_het = [[200, 0, 200]]
    p2 = denovo_posterior(child_pl, mother_het, parent_pl)
    assert p2[0] < 0.01
    # weak child evidence -> low de novo posterior
    child_weak = [[0, 10, 60]]
    p3 = denovo_posterior(child_weak, parent_pl, parent_pl)
    assert p3[0] < p[0]


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


def test_denovo_cli_scores_against_homref_blocks(tmp_path):
    """Parents that are confidently hom-ref at the proband's candidate
    (covered only by gVCF blocks) still produce trio DQ scores."""
    import gzip

    import jax
    jax.config.update("jax_platforms", "cpu")
    from strelka_tpu.workflow.denovo import run_denovo
    from strelka_tpu.workflow.germline import run_germline

    for name, bam in (("prob", "NA12891_demo20.bam"),
                      ("mom", "NA12892_demo20.bam"),
                      ("dad", "NA12892_demo20.bam")):
        run_germline([
            "--reference", "/root/reference/src/demo/data/demo20.fa",
            "--align-file", f"/root/reference/src/demo/data/{bam}",
            "--output-dir", str(tmp_path / name), "--exome"])
    out = str(tmp_path / "denovo.vcf.gz")
    rc = run_denovo([
        "--proband", str(tmp_path / "prob" / "genome.S1.vcf.gz"),
        "--mother", str(tmp_path / "mom" / "genome.S1.vcf.gz"),
        "--father", str(tmp_path / "dad" / "genome.S1.vcf.gz"),
        "--output", out])
    assert rc == 0
    dq = {}
    with gzip.open(out, "rt") as f:
        for line in f:
            if line.startswith("#") or "DQ=" not in line:
                continue
            fields = line.split("\t")
            info = dict(kv.split("=") for kv in fields[7].split(";")
                        if "=" in kv)
            dq[int(fields[1])] = float(info["DQ"])
    assert len(dq) >= 10, dq
    # the proband-only TAT insertion gets a nonzero de novo score.
    # NOTE: parent hom-ref PLs are synthesized from the covering
    # block's min-GQX; with reference-style coarse blocks
    # (check_block_tolerance) that min is ~39 here, which caps DQ far
    # below the old fine-block value — the reference denovo.py has the
    # same property on real Strelka gVCFs.
    assert dq.get(1148, 0) >= 1, dq.get(1148)
    # and some proband-only site clears a stronger threshold
    assert max(dq.values()) >= 5, dq


def test_denovo_posterior_matches_denovogear_reference():
    """Validate the trio model against the DeNovoGear reference values
    the reference ships (deNovoQualityScore/test/data/dng-auto-ref):
    pp_dnm must agree closely on every confident call and ranking."""
    import gzip
    import re

    import numpy as np

    from strelka_tpu.workflow.denovo import denovo_posterior

    base = "/root/reference/src/python/deNovoQualityScore/test/data"
    dng = {}
    with gzip.open(f"{base}/dng-auto-ref.txt.gz", "rt") as f:
        for line in f:
            m = re.search(r"chr: (\S+) pos: (\d+) .*pp_dnm: (\S+)", line)
            if m:
                dng[(m.group(1), int(m.group(2)))] = float(m.group(3))
    pls = {}
    with gzip.open(f"{base}/denovo-chr1-200-snv.vcf.gz", "rt") as f:
        for line in f:
            if line.startswith("#"):
                continue
            fx = line.rstrip("\n").split("\t")
            fmt = fx[8].split(":")
            if "PL" not in fmt or "," in fx[4]:
                continue
            pli = fmt.index("PL")
            try:
                trio = [list(map(int, fx[9 + i].split(":")[pli].split(",")))
                        for i in range(3)]
            except (ValueError, IndexError):
                continue
            if any(len(p) != 3 for p in trio):
                continue
            pls[(fx[0], int(fx[1]))] = trio
    common = sorted(set(dng) & set(pls))
    assert len(common) == 200
    post = denovo_posterior(np.array([pls[k][0] for k in common]),
                            np.array([pls[k][1] for k in common]),
                            np.array([pls[k][2] for k in common]))
    pp = np.array([dng[k] for k in common])
    # the top DNG candidate (a Mendelian-violation hom-alt child) and
    # every pp > 0.05 site agree within a small absolute margin
    strong = pp > 0.05
    assert strong.sum() >= 4
    assert np.all(np.abs(post[strong] - pp[strong]) < 0.05)
    # clear rejections stay rejected
    lo = pp < 1e-6
    assert float(post[lo].max()) < 1e-3
    # overall ranking agreement
    m = (pp > 1e-300) & (post > 1e-300)
    corr = float(np.corrcoef(np.log10(pp[m]), np.log10(post[m]))[0, 1])
    assert corr > 0.99
    top10 = len(set(np.argsort(-pp)[:10]) & set(np.argsort(-post)[:10]))
    assert top10 >= 9


def test_denovo_multisample_vcf_mode(tmp_path):
    """Reference-style interface: multi-sample VCF + sample IDs
    (denovo.py in_vcf/--proband/--mother/--father)."""
    import gzip

    from strelka_tpu.workflow.denovo import run_denovo

    vcf = tmp_path / "trio.vcf"
    # site 100: clear de novo (parents hom-ref, child het)
    # site 200: inherited het (mother het)
    # site 300: multi-allelic -> passes through unscored
    vcf.write_text("\n".join([
        "##fileformat=VCFv4.1",
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="gt">',
        '##FORMAT=<ID=PL,Number=G,Type=Integer,Description="pl">',
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tKID\tMOM\tDAD",
        "chr1\t100\t.\tA\tG\t50\tPASS\t.\tGT:PL\t0/1:150,0,150\t0/0:0,120,990\t0/0:0,120,990",
        "chr1\t200\t.\tC\tT\t50\tPASS\t.\tGT:PL\t0/1:60,0,60\t0/1:50,0,50\t0/0:0,90,990",
        "chr1\t300\t.\tG\tA,C\t50\tPASS\t.\tGT:PL\t1/2:90,60,50,60,0,50\t0/0:0,90,990,90,990,990\t0/0:0,90,990,90,990,990",
    ]) + "\n")
    out = tmp_path / "out.vcf.gz"
    rc = run_denovo(["--vcf", str(vcf), "--proband-id", "KID",
                     "--mother-id", "MOM", "--father-id", "DAD",
                     "--output", str(out)])
    assert rc == 0
    dq = {}
    with gzip.open(out, "rt") as f:
        for line in f:
            if line.startswith("#"):
                continue
            fields = line.split("\t")
            for kv in fields[7].split(";"):
                if kv.startswith("DQ="):
                    dq[int(fields[1])] = float(kv[3:])
    assert 100 in dq and dq[100] > 10   # de novo scores high
    assert dq.get(200, 0.0) <= 1.0      # inherited het scores ~0
    assert 300 not in dq                # multi-allelic unscored
