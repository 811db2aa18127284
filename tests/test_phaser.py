"""VariantPhaser transcription oracle + differential fuzz.

The oracle below mirrors the C++ control flow of
VariantPhaser::processLocus/outputBuffer/createPhaseRecord
(VariantPhaser.cpp:25-264) statement by statement, with mutable
per-locus state like the reference (setPhased swaps allele indices in
place, vcf_util.hh:204-211). The production implementation
(strelka_tpu.pipeline.phaser.build_phase_plan) is a restructured
two-pass form; the fuzz drives both over random locus streams and
compares every per-sample outcome (PS id, phased flag, emitted allele
order).
"""
import random

from strelka_tpu.pipeline.phaser import (PhaseLocus, SampleGt,
                                         build_phase_plan)


class _OracleGt:
    """VcfGenotype mutable subset (vcf_util.hh:130-345)."""

    def __init__(self, sg: SampleGt):
        self.ploidy = sg.ploidy
        self.a0 = sg.a0
        self.a1 = sg.a1
        self.hap0 = sg.hap0
        self.hap1 = sg.hap1
        self.is_variant = sg.is_variant
        self.is_phased = False
        self.phase_set_id = -1

    def is_het(self):
        return self.ploidy == 2 and self.a0 != self.a1

    def is_conflict(self):
        if self.is_het():
            return (self.hap0 == self.hap1 or self.hap0 == 3
                    or self.hap1 == 3)
        return self.hap0 != self.hap1

    def set_phased(self, is_flip):
        self.is_phased = True
        if is_flip:
            self.a0, self.a1 = self.a1, self.a0
            # NOTE: haplotype ids are NOT swapped by setPhased
            # (vcf_util.hh:204-211) — only allele indices


class _OracleLocus:
    def __init__(self, locus: PhaseLocus):
        self.key = locus.key
        self.vcf_pos = locus.vcf_pos
        self.ar_id = locus.ar_id
        self.samples = [(_OracleGt(sg) if sg is not None else None)
                        for sg in locus.samples]


def oracle_phase(loci, n_samples):
    """Literal transcription of the phaser pipeline stage."""
    out = []
    buffer = []

    def create_phase_record(sample_index):
        # VariantPhaser.cpp:95-257
        if not buffer:
            return
        is_het_hap1 = []
        is_het_hap2 = []
        num_het_variants = []
        active_region_id = -1
        for locus in buffer:
            si = locus.samples[sample_index]
            if si is None or (not si.is_variant) or locus.ar_id < 0:
                continue
            if locus.ar_id != active_region_id:
                is_het_hap1.append(False)
                is_het_hap2.append(False)
                num_het_variants.append(0)
                active_region_id = locus.ar_id
            is_het = si.is_het()
            is_conflict = si.is_conflict()
            if is_het and not is_conflict:
                num_het_variants[-1] += 1
                if si.hap0 == 1:
                    is_het_hap1[-1] = True
                elif si.hap0 == 2:
                    is_het_hap2[-1] = True
                if si.ploidy == 2:
                    if si.hap1 == 1:
                        is_het_hap1[-1] = True
                    elif si.hap1 == 2:
                        is_het_hap2[-1] = True

        buffer_ar_index = -1
        active_region_id = -1
        haplotype_id_of_first_nonref_allele = 0
        pos_first_variant_in_phase_set = -1
        for locus in buffer:
            si = locus.samples[sample_index]
            if si is None or (not si.is_variant) or locus.ar_id < 0:
                continue
            if locus.ar_id != active_region_id:
                buffer_ar_index += 1
                pos_first_variant_in_phase_set = -1
                active_region_id = locus.ar_id
            if num_het_variants[buffer_ar_index] <= 1:
                continue
            if (not si.is_het()) or si.is_conflict():
                continue
            if pos_first_variant_in_phase_set < 0:
                pos_first_variant_in_phase_set = locus.vcf_pos
            si.phase_set_id = pos_first_variant_in_phase_set
            if (not is_het_hap1[buffer_ar_index]) or \
               (not is_het_hap2[buffer_ar_index]):
                si.set_phased(False)
            else:
                allele0_haplotype_id = si.hap0
                allele1_haplotype_id = si.hap1
                if haplotype_id_of_first_nonref_allele == 0:
                    if allele0_haplotype_id > 0:
                        haplotype_id_of_first_nonref_allele = \
                            allele0_haplotype_id
                    elif allele1_haplotype_id == 1:
                        haplotype_id_of_first_nonref_allele = 2
                    elif allele1_haplotype_id == 2:
                        haplotype_id_of_first_nonref_allele = 1
                is_flip = False
                if allele0_haplotype_id == 0:
                    if allele1_haplotype_id == \
                       haplotype_id_of_first_nonref_allele:
                        is_flip = True
                else:
                    if allele0_haplotype_id != \
                       haplotype_id_of_first_nonref_allele:
                        is_flip = True
                si.set_phased(is_flip)

    def output_buffer():
        for sample_index in range(n_samples):
            create_phase_record(sample_index)
        out.extend(buffer)
        buffer.clear()

    for locus in loci:
        ol = _OracleLocus(locus)
        if ol.ar_id < 0:
            output_buffer()
            out.append(ol)
        else:
            buffer.append(ol)
    output_buffer()   # flush_impl
    return out


def _random_stream(rng, n_samples):
    loci = []
    pos = 10
    n_ar = rng.randint(1, 4)
    for ar in range(n_ar):
        ar_id = pos
        n_in_ar = rng.randint(1, 6)
        for _ in range(n_in_ar):
            samples = []
            for _s in range(n_samples):
                if rng.random() < 0.2:
                    samples.append(None)
                    continue
                ploidy = 2 if rng.random() < 0.9 else 1
                if ploidy == 1:
                    a0 = a1 = rng.choice([0, 1])
                else:
                    a0 = rng.choice([0, 0, 0, 1])
                    a1 = rng.choice([0, 1, 1, 2])
                    if a0 > a1:
                        a0, a1 = a1, a0
                hap = lambda a: 0 if a == 0 else rng.choice(
                    [0, 1, 1, 2, 2, 3])
                samples.append(SampleGt(
                    ploidy=ploidy, a0=a0, a1=a1,
                    hap0=hap(a0), hap1=hap(a1),
                    is_variant=(a0 != 0 or a1 != 0)))
            kind = "indel" if rng.random() < 0.3 else "site"
            vcf_pos = pos + 1 if kind == "site" else pos
            loci.append(PhaseLocus(key=(kind, pos, len(loci)),
                                   vcf_pos=vcf_pos, ar_id=ar_id,
                                   samples=samples))
            pos += rng.randint(1, 3)
        # gap between ARs: sometimes emit an out-of-AR locus (flushes
        # the buffer), sometimes jump straight to the next AR
        # (multi-AR buffer, exercising the persistent
        # haplotypeIdOfFirstNonRefAllele quirk)
        if rng.random() < 0.6:
            loci.append(PhaseLocus(
                key=("site", pos, len(loci)), vcf_pos=pos + 1, ar_id=-1,
                samples=[SampleGt(2, 0, 1, 0, 0, True)
                         if rng.random() < 0.3 else None
                         for _s in range(n_samples)]))
            pos += rng.randint(1, 3)
        pos += rng.randint(0, 2)
    return loci


def _compare(loci, n_samples):
    plan = build_phase_plan(loci, n_samples)
    oracle_out = oracle_phase(loci, n_samples)
    assert len(oracle_out) == len(loci)
    by_key = {ol.key: ol for ol in oracle_out}
    for locus in loci:
        ol = by_key[locus.key]
        for s in range(n_samples):
            sg = locus.samples[s]
            og = ol.samples[s]
            dec = plan.get((locus.key, s))
            if og is None:
                assert dec is None
                continue
            if og.phase_set_id < 0:
                assert dec is None, (locus.key, s, dec)
                continue
            assert dec is not None, (locus.key, s)
            assert dec.ps == og.phase_set_id
            assert dec.phased == og.is_phased
            want = (og.a0, og.a1)
            got = (sg.a1, sg.a0) if dec.flip else (sg.a0, sg.a1)
            assert got == want, (locus.key, s, got, want)


def test_fuzz_vs_oracle():
    rng = random.Random(0)
    for trial in range(400):
        n_samples = rng.choice([1, 1, 2, 3])
        loci = _random_stream(rng, n_samples)
        _compare(loci, n_samples)


def _mk(pos, a0, a1, hap0, hap1, ar, ploidy=2, kind="site"):
    return PhaseLocus(
        key=(kind, pos), vcf_pos=pos + 1 if kind == "site" else pos,
        ar_id=ar,
        samples=[SampleGt(ploidy, a0, a1, hap0, hap1,
                          a0 != 0 or a1 != 0)])


def _gts(loci, plan):
    outs = []
    for lc in loci:
        d = plan.get((lc.key, 0))
        sg = lc.samples[0]
        if sg is None:
            outs.append(("0/1", None))
            continue
        if d is None:
            outs.append((f"{sg.a0}/{sg.a1}", None))
        else:
            a, b = (sg.a1, sg.a0) if d.flip else (sg.a0, sg.a1)
            outs.append((f"{a}|{b}" if d.phased else f"{a}/{b}", d.ps))
    return outs


def test_two_het_same_hap_unflipped():
    """Both hets on hap 1 only -> 'simple case': phased 0|1, no flip,
    PS = first het's VCF pos (VariantPhaser.cpp:221-226)."""
    loci = [_mk(10, 0, 1, 0, 1, 10), _mk(14, 0, 1, 0, 1, 10)]
    plan = build_phase_plan(loci, 1)
    assert _gts(loci, plan) == [("0|1", 11), ("0|1", 11)]


def test_opposite_haps_first_prints_01():
    """First het on hap 1, second on hap 2: first prints 0|1, second
    flips to 1|0 (orientation anchored to the first variant,
    VariantPhaser.cpp:232-254)."""
    loci = [_mk(10, 0, 1, 0, 1, 10), _mk(14, 0, 1, 0, 2, 10)]
    plan = build_phase_plan(loci, 1)
    assert _gts(loci, plan) == [("0|1", 11), ("1|0", 11)]
    # and symmetric: first on hap 2
    loci = [_mk(10, 0, 1, 0, 2, 10), _mk(14, 0, 1, 0, 1, 10)]
    plan = build_phase_plan(loci, 1)
    assert _gts(loci, plan) == [("0|1", 11), ("1|0", 11)]


def test_single_het_not_phased():
    """numHetVariants <= 1 -> no phasing, no PS
    (VariantPhaser.cpp:191-192)."""
    loci = [_mk(10, 0, 1, 0, 1, 10), _mk(14, 1, 1, 1, 1, 10)]
    plan = build_phase_plan(loci, 1)
    assert plan == {}


def test_conflict_het_excluded():
    """A het whose alt is not on a selected haplotype (hap 0) is a
    conflict: it neither counts toward numHetVariants nor gets PS
    (vcf_util.hh:282-289)."""
    loci = [_mk(10, 0, 1, 0, 1, 10), _mk(12, 0, 1, 0, 0, 10),
            _mk(14, 0, 1, 0, 2, 10)]
    plan = build_phase_plan(loci, 1)
    assert _gts(loci, plan) == [("0|1", 11), ("0/1", None), ("1|0", 11)]


def test_hom_gets_no_ps():
    loci = [_mk(10, 0, 1, 0, 1, 10), _mk(12, 1, 1, 1, 1, 10),
            _mk(14, 0, 1, 0, 2, 10)]
    plan = build_phase_plan(loci, 1)
    assert _gts(loci, plan)[1] == ("1/1", None)


def test_hetalt_flip():
    """1/2 het-alt: flip orientation follows allele0's haplotype
    (VariantPhaser.cpp:249-254)."""
    loci = [_mk(10, 0, 1, 0, 1, 10), _mk(14, 1, 2, 2, 1, 10)]
    plan = build_phase_plan(loci, 1)
    # first variant alt on hap1 -> firstNonRef = 2; het-alt allele0 on
    # hap 2 == firstNonRef -> no flip
    assert _gts(loci, plan) == [("0|1", 11), ("1|2", 11)]


def test_ps_is_first_het_pos_not_ar_start():
    """PS must be the first HET variant's position, not the active
    region start (a hom at the AR head must not shift PS)."""
    loci = [_mk(10, 1, 1, 1, 1, 8), _mk(12, 0, 1, 0, 1, 8),
            _mk(14, 0, 1, 0, 2, 8)]
    plan = build_phase_plan(loci, 1)
    assert _gts(loci, plan) == [("1/1", None), ("0|1", 13), ("1|0", 13)]


def test_indel_ps_uses_vcf_pos():
    """Indel loci participate in phase blocks; their PS source value is
    the indel VCF POS (no +1; VariantPhaser.cpp:199-216)."""
    loci = [_mk(10, 0, 1, 0, 1, 10, kind="indel"),
            _mk(14, 0, 1, 0, 2, 10)]
    plan = build_phase_plan(loci, 1)
    assert _gts(loci, plan) == [("0|1", 10), ("1|0", 10)]


def test_buffer_flush_resets_first_nonref_anchor():
    """An out-of-AR locus flushes the buffer; the next AR's orientation
    anchor is independent."""
    flushed = PhaseLocus(key=("site", 12), vcf_pos=13, ar_id=-1,
                         samples=[None])
    loci = [_mk(10, 0, 1, 0, 2, 9), _mk(11, 0, 1, 0, 1, 9), flushed,
            _mk(14, 0, 1, 0, 1, 14), _mk(15, 0, 1, 0, 2, 14)]
    plan = build_phase_plan(loci, 1)
    assert _gts(loci, plan) == [("0|1", 11), ("1|0", 11), ("0/1", None),
                                ("0|1", 15), ("1|0", 15)]


def test_adjacent_ars_share_orientation_anchor():
    """Two ARs in one buffer (no out-of-AR locus between them): the
    reference's haplotypeIdOfFirstNonRefAllele persists across the ar
    run boundary (VariantPhaser.cpp:163 quirk) — the second AR's first
    variant may print 1|0."""
    loci = [_mk(10, 0, 1, 0, 2, 9), _mk(11, 0, 1, 0, 1, 9),
            _mk(14, 0, 1, 0, 1, 14), _mk(15, 0, 1, 0, 2, 14)]
    plan = build_phase_plan(loci, 1)
    # buffer anchor: first variant alt hap 2 -> firstNonRef = 1.
    # second AR: hap1 alt == firstNonRef -> FLIPPED first record.
    assert _gts(loci, plan) == [("0|1", 11), ("1|0", 11),
                                ("1|0", 15), ("0|1", 15)]
