"""End-to-end workflow test: deterministic fixtures -> batched proving
(accounting mode) -> layer-3 aggregation -> Pedersen commitment assertion,
with real Groth16 proofs at every layer (the reference's
tests/N_sigs_K_batches_H_height.sh harness pattern)."""

import json
import os

import pytest

import tests.conftest as cft  # noqa: F401
from zkpoa_tpu.fields import curve25519 as C
from zkpoa_tpu.pipeline import fixtures, planner
from zkpoa_tpu.pipeline.workflow import run_workflow
from zkpoa_tpu.prover import groth16


def test_batch_planner_matches_reference_math():
    # num_sigs >= ideal: remainder minimized
    assert planner.batch_size(10, 4) in (3, 4, 5)
    p = planner.plan(10, 4)
    assert sum(p.batch_sizes()) == 10
    assert planner.plan(3, 8).batch_size == 3  # fewer sigs than ideal
    assert planner.merkle_height(10) == 5  # ceil(log2(10)) + 1


def test_fixture_signatures_roundtrip(tmp_path):
    sigs = tmp_path / "sigs.json"
    anon = tmp_path / "anon.csv"
    fixtures.write_fixtures(3, str(sigs), str(anon), extra=13)
    from zkpoa_tpu.pipeline.sigs import parse_signatures_file

    atts = parse_signatures_file(str(sigs))
    assert len(atts) == 3
    assert atts[0].address < atts[1].address < atts[2].address


@pytest.mark.slow
def test_workflow_end_to_end_accounting(tmp_path):
    sigs = tmp_path / "sigs.json"
    anon = tmp_path / "anon.csv"
    fixtures.write_fixtures(4, str(sigs), str(anon), extra=12)
    blind = 0xB11DD1E5

    res = run_workflow(
        str(sigs),
        str(anon),
        blind,
        build_root=str(tmp_path / "build"),
        ideal_batch_size=2,
        mode="accounting",
        zkey_cache=str(tmp_path / "zkeys"),
    )
    assert res.num_batches == 2
    # artifacts exist and verify independently
    for bi in range(res.num_batches):
        bdir = os.path.join(res.build_dir, f"batch_{bi}")
        assert groth16.verify_files(
            os.path.join(bdir, "layer_two_vkey.json"),
            os.path.join(bdir, "proof.json"),
            os.path.join(bdir, "public.json"),
        )
    l3 = os.path.join(res.build_dir, "layer_three")
    assert groth16.verify_files(
        os.path.join(l3, "layer_three_vkey.json"),
        os.path.join(l3, "proof.json"),
        os.path.join(l3, "public.json"),
    )
    # the commitment commits to the true balance sum
    expected = C.pedersen_commitment(res.balance_sum, blind)
    assert C.point_equal(res.commitment, expected)
    # balance sum equals the fixture balances
    atts = json.load(open(sigs))
    assert res.balance_sum == sum(int(e["balance"]) for e in atts)


@pytest.mark.slow
def test_workflow_resume_from_artifacts(tmp_path, monkeypatch):
    """resume=True reloads completed per-batch layers from their on-disk
    artifacts instead of re-proving (SURVEY §5 checkpoint/resume)."""
    sigs = tmp_path / "sigs.json"
    anon = tmp_path / "anon.csv"
    fixtures.write_fixtures(2, str(sigs), str(anon), extra=4)
    kwargs = dict(
        build_root=str(tmp_path / "build"), ideal_batch_size=1,
        mode="accounting", zkey_cache=str(tmp_path / "zkeys"), tree_height=4,
    )
    res1 = run_workflow(str(sigs), str(anon), 0x5EED, **kwargs)

    import zkpoa_tpu.pipeline.workflow as wf

    calls = []
    orig = wf._prove_many

    def counting(pk, r1cs, wits, seeds):
        calls.extend(seeds)
        return orig(pk, r1cs, wits, seeds)

    monkeypatch.setattr(wf, "_prove_many", counting)
    res2 = run_workflow(str(sigs), str(anon), 0x5EED, resume=True, **kwargs)
    # both batches' layer-2 proofs were resumed: only layer 3 re-proves
    assert not any(s.startswith("l2") for s in calls), calls
    assert res2.balance_sum == res1.balance_sum
    assert res2.merkle_root == res1.merkle_root
    expected = C.pedersen_commitment(res2.balance_sum, 0x5EED)
    assert C.point_equal(res2.commitment, expected)


@pytest.mark.slow
def test_workflow_remainder_batches(tmp_path):
    """5 sigs at ideal batch size 2 -> two key SHAPES (2-sig batches and a
    1-sig remainder batch): exercises _shape_groups end-to-end with two
    per-shape proving keys (reference remainder handling,
    full_workflow.sh batch plan)."""
    sigs = tmp_path / "sigs.json"
    anon = tmp_path / "anon.csv"
    fixtures.write_fixtures(5, str(sigs), str(anon), extra=8)
    blind = 0x0DD
    res = run_workflow(
        str(sigs), str(anon), blind,
        build_root=str(tmp_path / "build"), ideal_batch_size=2,
        mode="accounting", zkey_cache=str(tmp_path / "zkeys"),
    )
    plan = planner.plan(5, 2)
    assert sorted(plan.batch_sizes()) == [1, 2, 2]
    assert res.num_batches == 3
    # two shapes -> two layer-2 proving keys in the cache
    import glob
    keys = glob.glob(str(tmp_path / "zkeys" / "layer_two_*"))
    assert len({k.split(".")[0] for k in keys}) == 2, keys
    for bi in range(res.num_batches):
        bdir = os.path.join(res.build_dir, f"batch_{bi}")
        assert groth16.verify_files(
            os.path.join(bdir, "layer_two_vkey.json"),
            os.path.join(bdir, "proof.json"),
            os.path.join(bdir, "public.json"),
        )
    expected = C.pedersen_commitment(res.balance_sum, blind)
    assert C.point_equal(res.commitment, expected)


@pytest.mark.slow
def test_workflow_ptau_ceremony(tmp_path):
    """Keys derive from a powers-of-tau ceremony file through the CLI
    (--ptau + phase-2 contribute + beacon): the reference's production
    setup path (g16_setup.sh:240-278), not the seeded dev SRS."""
    from zkpoa_tpu.pipeline.workflow import main as wf_main
    from zkpoa_tpu.prover.ptau import write_dev_ptau

    sigs = tmp_path / "sigs.json"
    anon = tmp_path / "anon.csv"
    fixtures.write_fixtures(2, str(sigs), str(anon), extra=4)
    ptau = tmp_path / "dev16.ptau"
    write_dev_ptau(str(ptau), 14)
    rc = wf_main([
        str(sigs), str(anon), "0x5EED",
        "-b", str(tmp_path / "build"), "-p", "1", "-H", "4",
        "-z", str(tmp_path / "zkeys"),
        "--ptau", str(ptau), "--contribute", "test-entropy", "--beacon", "beef",
    ])
    assert rc == 0
    import glob
    build_dir = glob.glob(str(tmp_path / "build" / "*_height"))[0]
    # every cached key is ptau-derived (no dev-SRS key was created)
    keys = glob.glob(str(tmp_path / "zkeys" / "*"))
    assert keys and all(".ptau." in k for k in keys), keys
    for bi in range(2):
        bdir = os.path.join(build_dir, f"batch_{bi}")
        assert groth16.verify_files(
            os.path.join(bdir, "layer_two_vkey.json"),
            os.path.join(bdir, "proof.json"),
            os.path.join(bdir, "public.json"),
        )


HEAVY_GATE = pytest.mark.skipif(
    os.environ.get("ZKPOA_HEAVY_TESTS") != "1",
    reason="full/recursive circuits start at ~1.4M/7M constraints (the "
           "in-circuit ECDSA* and pairing gadgets have no smaller shape); "
           "setup+prove at that scale runs hours on the 2-core CPU host. "
           "Recorded hardware runs (set ZKPOA_TEST_TPU=1 to repeat): "
           "full_mode PASSED on the chip in 25:16 "
           "(experiments/HEAVY_FULL.log, round 5); recursive_mode's "
           "contract is met by the committed 2-batch hardware chain "
           "(build/recursive_run2 + RECURSIVE_RUN.json, "
           "complete_chain_ok=true — layer-3 verifies both layer-2 "
           "proofs in-snark, Pedersen green).")


@pytest.mark.slow
@HEAVY_GATE
def test_workflow_full_mode_e2e(tmp_path):
    """Full-mode e2e at 1 signature: complete in-circuit ECDSA* layer-1 +
    Keccak-address layer-2 (the reference's real protocol circuits,
    tests/1_sigs_1_batches_5_height.sh) proved and verified end-to-end."""
    sigs = tmp_path / "sigs.json"
    anon = tmp_path / "anon.csv"
    fixtures.write_fixtures(1, str(sigs), str(anon), extra=3)
    blind = 0xF111
    res = run_workflow(
        str(sigs), str(anon), blind,
        build_root=str(tmp_path / "build"), ideal_batch_size=1,
        mode="full", zkey_cache=str(tmp_path / "zkeys"), tree_height=3,
    )
    assert res.num_batches == 1
    bdir = os.path.join(res.build_dir, "batch_0")
    # layer-2 proof + publics verify from disk; the layer-1 proof persists
    # in sanitized register form next to its vkey (reference file shapes)
    assert groth16.verify_files(
        os.path.join(bdir, "layer_two_vkey.json"),
        os.path.join(bdir, "proof.json"),
        os.path.join(bdir, "public.json"),
    )
    assert os.path.exists(os.path.join(bdir, "layer_one_vkey.json"))
    assert os.path.exists(os.path.join(bdir, "layer_one_sanitized_proof.json"))
    expected = C.pedersen_commitment(res.balance_sum, blind)
    assert C.point_equal(res.commitment, expected)


@pytest.mark.slow
@HEAVY_GATE
def test_workflow_recursive_mode_e2e(tmp_path):
    """Recursive-mode e2e at 1 signature: layer-2 verifies the layer-1
    proof IN-SNARK (residue-witness pairing verifier), layer-3 verifies
    layer-2 in-snark + Pedersen (full_workflow.sh:558-592 contract)."""
    sigs = tmp_path / "sigs.json"
    anon = tmp_path / "anon.csv"
    fixtures.write_fixtures(1, str(sigs), str(anon), extra=3)
    blind = 0x1CE
    res = run_workflow(
        str(sigs), str(anon), blind,
        build_root=str(tmp_path / "build"), ideal_batch_size=1,
        mode="recursive", zkey_cache=str(tmp_path / "zkeys"), tree_height=3,
    )
    bdir = os.path.join(res.build_dir, "batch_0")
    assert groth16.verify_files(
        os.path.join(bdir, "layer_two_vkey.json"),
        os.path.join(bdir, "proof.json"),
        os.path.join(bdir, "public.json"),
    )
    l3 = os.path.join(res.build_dir, "layer_three")
    assert groth16.verify_files(
        os.path.join(l3, "layer_three_vkey.json"),
        os.path.join(l3, "proof.json"),
        os.path.join(l3, "public.json"),
    )
    expected = C.pedersen_commitment(res.balance_sum, blind)
    assert C.point_equal(res.commitment, expected)
