"""Batched multi-locus scoring vs the per-locus reference path."""
import numpy as np
import pytest

from strelka_tpu.io.fasta import decode_bases
from strelka_tpu.pipeline import candidates as cand
from strelka_tpu.pipeline import reads as rd
from strelka_tpu.pipeline import realign, realign_batch

from tests.test_readlik import make_indel_batch


def test_batched_matches_per_locus():
    rng = np.random.default_rng(21)
    ref = rng.integers(0, 4, 2000).astype(np.uint8)
    keys = [cand.IndelKey(400, 3, ""),
            cand.IndelKey(900, 0, "ACG"),
            cand.IndelKey(1500, 1, "")]
    # one combined read set covering all three loci
    batches = []
    from tests.test_pileup import make_batch
    reads = []
    for key, seed in zip(keys, (1, 2, 3)):
        b = make_indel_batch(ref, [key], n_reads=25, vaf=0.5, seed=seed)
        for i in range(b.n):
            ops, lens = b.get_cigar(i)
            from strelka_tpu.utils import cigar as cg
            reads.append((int(b.pos[i]), cg.cigar_to_string(ops, lens),
                          decode_bases(b.get_seq(i)),
                          list(b.get_qual(i)), int(b.flag[i]), int(b.mapq[i])))
    batch = make_batch(reads)
    keep, level = rd.filter_and_classify_reads(batch, 20)
    ea = rd.expand_alignments(batch)

    loci = [[k] for k in keys]
    batched = realign_batch.score_loci_batched(
        batch, ea, level, ref, 0, loci, use_pallas=False)
    assert set(batched) == {0, 1, 2}
    for li, key in enumerate(keys):
        single = realign.score_locus(batch, ea, level, ref, 0, [key])
        got = batched[li]
        assert np.array_equal(got.read_rows, single.read_rows)
        np.testing.assert_allclose(got.allele_lhoods, single.allele_lhoods,
                                   rtol=1e-5, atol=1e-3)
        np.testing.assert_array_equal(got.n_nonambig, single.n_nonambig)


def test_batched_empty_loci():
    rng = np.random.default_rng(3)
    ref = rng.integers(0, 4, 500).astype(np.uint8)
    from tests.test_pileup import make_batch
    batch = make_batch([(10, "50M", decode_bases(ref[10:60]), [30] * 50, 0, 60)])
    keep, level = rd.filter_and_classify_reads(batch, 20)
    ea = rd.expand_alignments(batch)
    # locus far away from any read -> absent from results
    out = realign_batch.score_loci_batched(
        batch, ea, level, ref, 0, [[cand.IndelKey(400, 2, "")]],
        use_pallas=False)
    assert out == {}


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


def test_multi_chunk_scoring_is_deterministic(tmp_path):
    """Regression: jax CPU zero-copies int8 numpy inputs, so reusing
    the chunk staging buffers across launches raced with the async
    kernel and randomly zeroed locus scores at >1-chunk scale. The
    same region called twice must produce identical records."""
    import jax

    from benchmarks import synth
    from strelka_tpu.io.fasta import FastaReference
    from strelka_tpu.options import GermlineOptions
    from strelka_tpu.pipeline import germline_caller as gc
    from strelka_tpu.pipeline import gvcf

    refs, batch, _ = synth.generate(L=60_000, depth=30, indel_every=300,
                                    seed=5)
    fa = tmp_path / "ref.fa"
    fa.write_text(">d\n" + refs + "\n")
    ref = FastaReference(str(fa))
    opt = GermlineOptions()
    outs = []
    for _ in range(2):
        res = gc.call_region(opt, ref, "d", 0, 60_000, [batch])
        _g, v = gvcf.emit_region(opt, res, ["S"])
        outs.append(v)
    assert outs[0] == outs[1]
    assert len(outs[0]) > 100  # the region actually called variants
