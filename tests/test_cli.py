"""CLI parser tests (the runtime replacement for the reference's
compile-time #define config, bldpc_实习/define.cuh:20-61,
myNBLDPC/include/define.h:23-61).  Parser-level only — sweeps themselves
are covered by test_sim."""

import pytest

from cuda_ldpc_tpu import cli


def parse(argv):
    return cli.build_parser().parse_args(argv)


def test_binary_defaults_match_reference_macros():
    a = parse(["binary"])
    assert a.code == "J4_L24_Z96"
    assert a.max_iters == 50            # maxIT, define.cuh:35
    assert a.alpha == 1.0               # opt_R commented out, define.cuh:36
    assert a.rule == "minsum"           # decoder_method=0, define.cuh:33
    assert a.snr_type == "esn0"         # snrtype, define.cuh:51
    assert a.least_error_frames == 50   # define.cuh:52
    assert a.least_test_frames == 10000  # define.cuh:53
    assert a.batch == 4096              # Num_Frames_OneTime, define.cuh:60


def test_nb_defaults_match_reference_macros():
    a = parse(["nb"])
    assert a.code == "BDS.576.288.GF.64"  # Matrixfile, define.h:23
    assert a.method == "ems"              # decoder_method=0, define.h:37
    assert a.nm == 2 and a.nc == 2        # EMS_NM/NC, define.h:31-32
    assert a.max_iters == 20              # maxIT, define.h:35
    assert a.n_qam == 2                   # n_QAM, define.h:25
    assert a.snr_type == "ebn0"


def test_rule_and_method_choices():
    assert parse(["binary", "--rule", "bp"]).rule == "bp"
    assert parse(["nb", "--method", "layered_qspa"]).method == "layered_qspa"
    assert parse(["nb", "--method", "qspa"]).method == "qspa"
    with pytest.raises(SystemExit):
        parse(["binary", "--rule", "nope"])
    with pytest.raises(SystemExit):
        parse(["nb", "--method", "nope"])


def test_snr_spec_forms():
    assert parse(["binary", "--snr", "2.5"]).snr == (2.5, 1.0, 2.5)
    assert parse(["binary", "--snr", "0:0.2:13"]).snr == (0.0, 0.2, 13.0)
    with pytest.raises(SystemExit):
        parse(["binary", "--snr", "1:2"])
    with pytest.raises(SystemExit):
        parse(["binary", "--snr", "abc"])


def test_list_codes_runs():
    assert cli.main(["list-codes"]) == 0
