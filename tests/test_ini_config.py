"""Reference-style ini configuration (configureStrelka*Workflow.py.ini
-> option overrides)."""
import pytest

from strelka_tpu.options import GermlineOptions, SomaticOptions, apply_ini

REF_GERM_INI = "/root/reference/src/python/bin/configureStrelkaGermlineWorkflow.py.ini"
REF_SOM_INI = "/root/reference/src/python/bin/configureStrelkaSomaticWorkflow.py.ini"


def test_reference_germline_ini_loads():
    opt, extras = apply_ini(GermlineOptions(), REF_GERM_INI)
    assert opt.max_indel_size == 49
    assert opt.min_mapping_quality == 20
    assert extras == {}


def test_reference_somatic_ini_loads():
    opt, extras = apply_ini(SomaticOptions(), REF_SOM_INI)
    assert opt.max_indel_size == 49
    assert opt.somatic_snv_rate == pytest.approx(1e-4)
    assert opt.shared_site_error_rate == pytest.approx(5e-10)
    assert opt.shared_indel_error_factor == pytest.approx(2.2)
    assert opt.shared_site_error_strand_bias_fraction == 0.0
    assert opt.somatic_snv_min_qss_ref == 15
    assert opt.somatic_indel_min_qsi_filter == 40
    assert opt.ssnv_contam_tolerance == pytest.approx(0.15)
    assert opt.max_depth_factor == pytest.approx(3.0)
    assert extras == {}


def test_custom_overrides(tmp_path):
    ini = tmp_path / "custom.ini"
    ini.write_text("[StrelkaSomatic]\nssnvPrior = 0.001\n"
                   "minTier2Mapq = 5\nisWriteRealignedBam = 1\n")
    opt, extras = apply_ini(SomaticOptions(), str(ini))
    assert opt.somatic_snv_rate == pytest.approx(1e-3)
    assert opt.tier2_min_single_align_score == 5
    assert extras["is_write_realigned_bam"] is True


def test_unknown_key_rejected(tmp_path):
    ini = tmp_path / "bad.ini"
    ini.write_text("[StrelkaGermline]\nnotAnOption = 1\n")
    with pytest.raises(ValueError, match="unknown ini option"):
        apply_ini(GermlineOptions(), str(ini))
