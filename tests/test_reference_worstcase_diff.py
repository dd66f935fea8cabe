"""Differential tests of the worst-case SEA aggregation against the
reference's ACTUAL ``tools/worse_only.py`` (VERDICT round-2 Next #2).

The compat engine (``_worst_case_miou_reference_py`` and its C++ twin) was
previously verified only against a hand trace of the published code's
class-list-shrink quirk. Here ``evalSEA`` itself is imported
(``importlib`` by file path to dodge the ``tools`` package collision with
our own repo), driven with a stub dataset + in-memory argmax tensors, and
required to agree:

  * ``worse_case_eval`` (``worse_only.py:351-422``)  vs ``worst_case_aacc``
  * the per-image intersect/union tensors it computes via
    ``update_fn_indiv`` (``worse_only.py:48-66``) vs ``sea_intersect_union``
  * ``worst_case_miou``'s greedy search final mIoU (``worse_only.py:
    181-349``) vs the compat engine, with the global ``random`` module
    re-seeded to replicate its module-level ``random.seed(225)`` discipline.
"""

import importlib.util
import os
import random
import sys

import numpy as np
import pytest
import torch

from robseg_tpu.attacks.worst_case import (sea_intersect_union,
                                           worst_case_aacc, worst_case_miou)

_REF = "/root/reference"
_SHIMS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "reference_shims")


@pytest.fixture(scope="module")
def ref_wo():
    """``tools/worse_only.py`` loaded by file path (its ``from
    semseg.datasets...`` import needs /root/reference on sys.path)."""
    path = os.path.join(_REF, "tools", "worse_only.py")
    if not os.path.isfile(path):
        pytest.skip("reference repo not present")
    for p in (_SHIMS, _REF):
        if p not in sys.path:
            sys.path.insert(0, p)
    spec = importlib.util.spec_from_file_location("ref_worse_only", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)  # seeds the global random module (SEED 225)
    return mod


class _TargetDataset(torch.utils.data.Dataset):
    """Stub val_data: yields (dummy_img, target) like the reference loader
    consumes (``worse_only.py:215-216`` uses only ``vals[1]``)."""

    def __init__(self, targets: np.ndarray):
        self.targets = targets

    def __len__(self):
        return self.targets.shape[0]

    def __getitem__(self, i):
        return torch.zeros(1), torch.from_numpy(self.targets[i]).long()


def _instance(rng, n_img=10, n_att=3, n_cls=6, hw=16, absent=(4,),
              p_correct=0.55):
    """Synthetic SEA-shaped argmax dumps: partially-correct preds per
    attack, ignore pixels (-1) masked into the preds (parity with how both
    pipelines store argmaxes), some classes absent everywhere."""
    targets = rng.integers(0, n_cls, (n_img, hw, hw)).astype(np.int32)
    for a in absent:
        targets[targets == a] = 0
    targets[:, 0, :3] = -1  # ignore pixels
    preds = []
    for _ in range(n_att):
        wrong = rng.integers(0, n_cls, targets.shape).astype(np.int32)
        for a in absent:
            wrong[wrong == a] = 1
        p = np.where(rng.random(targets.shape) < p_correct, targets, wrong)
        p = np.where(targets == -1, -1, p).astype(np.int32)
        preds.append(p)
    return preds, targets


def _make_evalsea(ref_wo, preds, targets, tmp_path, eps=8):
    os.makedirs(os.path.join(str(tmp_path), "test_results"), exist_ok=True)
    l_outs = [torch.from_numpy(p).long() for p in preds]
    return ref_wo.evalSEA(
        val_data=_TargetDataset(targets), l_outs=l_outs, eps=eps,
        n_cls=6, addendum="diff", saveDir=str(tmp_path), saveDict={},
        modelName="diffmodel")


class TestReferenceWorstCaseDiff:
    def test_worse_case_eval_matches(self, rng, ref_wo, tmp_path):
        # bs must divide N: the reference slices ``pred = cw[:, i*BS:
        # i*BS+BS]`` with BS = the CURRENT batch's size (worse_only.py:378),
        # so a non-divisible trailing batch compares the WRONG images (see
        # test_worse_case_eval_trailing_batch_quirk below)
        preds, targets = _instance(rng)
        es = _make_evalsea(ref_wo, preds, targets, tmp_path)
        es.worse_case_eval(bs=5)
        want_worst = es.saveDict["worst_Acc"]
        want_indiv = np.asarray(es.saveDict["worst_Acc_indiv"])
        got_worst, got_indiv = worst_case_aacc(preds, targets)
        np.testing.assert_allclose(got_worst, want_worst, atol=1e-7)
        np.testing.assert_allclose(got_indiv, want_indiv, atol=1e-7)

    def test_worse_case_eval_trailing_batch_quirk(self, rng, ref_wo,
                                                  tmp_path):
        """Reference bug (found by this harness): with N % bs != 0 the last
        batch's preds are sliced at ``i*BS`` using the SHORT batch's size,
        i.e. the wrong images — the published worst-aAcc protocol silently
        does this whenever the val-set size doesn't divide the batch size.
        We deliberately do NOT replicate it; this test pins the mechanism
        so the deviation is documented, not accidental."""
        preds, targets = _instance(rng)  # N = 10
        es = _make_evalsea(ref_wo, preds, targets, tmp_path)
        es.worse_case_eval(bs=4)  # batches 4,4,2 -> last slice is 4:6
        got_worst, _ = worst_case_aacc(preds, targets)
        # reproduce the misalignment explicitly: the last batch scores
        # preds 4:6 against TARGETS 8:10 (a cross comparison)
        from robseg_tpu.ops.metrics import per_image_pixel_acc
        import jax.numpy as jnp
        accs = np.stack([np.asarray(per_image_pixel_acc(
            jnp.asarray(p), jnp.asarray(targets))) for p in preds])
        accs_bug = accs.copy()
        accs_bug[:, 8:10] = np.stack([np.asarray(per_image_pixel_acc(
            jnp.asarray(p[4:6]), jnp.asarray(targets[8:10])))
            for p in preds])
        assert abs(es.saveDict["worst_Acc"]
                   - accs_bug.min(0).mean()) < 1e-7
        # and the quirk really changes the answer on this instance
        assert abs(es.saveDict["worst_Acc"] - got_worst) > 1e-4

    def test_intersect_union_tensors_match_update_fn_indiv(self, rng, ref_wo,
                                                           tmp_path):
        """The aggregation inputs: our on-device one-hot-matmul reduction
        vs the reference's per-class host loops, element-exact."""
        preds, targets = _instance(rng)
        es = _make_evalsea(ref_wo, preds, targets, tmp_path)
        random.seed(225)
        es.worst_case_miou()
        saved = torch.load(os.path.join(
            str(tmp_path), "test_results", "stats_diff_8.pt"))
        want_i = saved["run_int_imwise"].numpy()   # (A, N, K)
        want_u = saved["run_union_imwise"].numpy()
        got_i, got_u = sea_intersect_union(preds, targets, num_classes=6)
        np.testing.assert_array_equal(got_i, want_i)
        np.testing.assert_array_equal(got_u, want_u)

    @pytest.mark.parametrize("inst_seed", [0, 1, 2])
    def test_greedy_final_miou_matches_compat_engine(self, ref_wo, tmp_path,
                                                     inst_seed):
        """The full greedy search (1000 shuffled rounds, global ``random``)
        vs the compat engine at the same seed — the search trajectory is
        float-comparison-driven, so agreement at 1e-12 over several
        instances pins the transcription (incl. the shrink quirk)."""
        rng = np.random.default_rng(100 + inst_seed)
        preds, targets = _instance(rng, n_img=8 + inst_seed * 3)
        es = _make_evalsea(ref_wo, preds, targets,
                           os.path.join(str(tmp_path), f"i{inst_seed}"))
        random.seed(225)  # replicate the module-level seeding discipline
        es.worst_case_miou()
        want = es.saveDict["final_miou"]
        ints, unis = sea_intersect_union(preds, targets, num_classes=6)
        got = worst_case_miou(ints, unis, seed=225,
                              engine="reference-python")
        assert abs(got - want) < 1e-12, (got, want)

    def test_native_compat_twin_matches_reference_too(self, rng, ref_wo,
                                                      tmp_path):
        from robseg_tpu.native import native_available
        if not native_available("worst_case"):
            pytest.skip("no C++ toolchain")
        preds, targets = _instance(rng, n_img=9)
        es = _make_evalsea(ref_wo, preds, targets, tmp_path)
        random.seed(225)
        es.worst_case_miou()
        want = es.saveDict["final_miou"]
        ints, unis = sea_intersect_union(preds, targets, num_classes=6)
        got = worst_case_miou(ints, unis, seed=225, engine="reference")
        assert abs(got - want) < 1e-12, (got, want)
