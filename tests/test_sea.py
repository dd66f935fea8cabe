"""SEA pipeline tests: orchestration end-to-end on a tiny model (CPU) and
worst-case aggregation vs brute force."""

import itertools

import numpy as np
import jax.numpy as jnp
import pytest

from robseg_tpu.attacks.sea import run_sea, eval_performance, check_imgs
from robseg_tpu.attacks.worst_case import (_miou_from, sea_intersect_union,
                                           worst_case_aacc, worst_case_miou)

C = 4
HW = 8


def _model(rng):
    wk = rng.normal(size=(3, C)).astype(np.float32) * 2.0

    def fn(x):
        return jnp.einsum("bhwc,cd->bhwd", x, jnp.asarray(wk))
    return fn


def _batches(rng, n=2, bs=2):
    out = []
    for _ in range(n):
        x = rng.random((bs, HW, HW, 3)).astype(np.float32)
        y = rng.integers(0, C, (bs, HW, HW)).astype(np.int32)
        out.append((x, y))
    return out


class TestSEAEndToEnd:
    def test_run_sea_structure(self, rng):
        fn = _model(rng)
        data = _batches(rng)
        res = run_sea(fn, lambda: iter(data), num_classes=C, eps=8 / 255,
                      n_iter=10, weights=np.ones(C, np.float32), seed=1)
        assert set(res) >= {"clean", "worst_Acc", "final_miou",
                            "loss-wise_miou"}
        assert len(res["loss-wise_miou"]) == 3
        # worst-case mIoU can't beat any individual attack
        assert res["final_miou"] <= min(res["loss-wise_miou"]) + 1e-6
        assert 0.0 <= res["worst_Acc"] <= 1.0

    def test_eval_performance_pads_partial_batches(self, rng):
        fn = _model(rng)
        b1 = _batches(rng, n=1, bs=3)[0]
        b2 = (b1[0][:1], b1[1][:1])  # partial trailing batch
        stats, preds = eval_performance(fn, [b1, b2], num_classes=C)
        assert preds.shape[0] == 4  # 3 + 1, padding stripped

    def test_check_imgs(self, rng):
        x = rng.random((2, 4, 4, 3)).astype(np.float32)
        adv = np.clip(x + 0.01, 0, 1)
        s = check_imgs(adv, x, "Linf")
        assert "max Linf pert" in s and "nan in imgs: 0" in s


class TestWorstCase:
    def test_worst_aacc_is_min_over_attacks(self, rng):
        targets = rng.integers(0, C, (5, HW, HW)).astype(np.int32)
        preds = [rng.integers(0, C, (5, HW, HW)).astype(np.int32)
                 for _ in range(3)]
        worst, per_attack = worst_case_aacc(preds, targets)
        accs = np.stack([(p == targets).reshape(5, -1).mean(-1)
                         for p in preds])
        assert np.isclose(worst, accs.min(0).mean())
        np.testing.assert_allclose(per_attack, accs.mean(-1), rtol=1e-6)

    def test_greedy_not_worse_than_start_and_near_bruteforce(self, rng):
        n_img, n_att = 5, 3
        targets = rng.integers(0, C, (n_img, HW, HW)).astype(np.int32)
        preds = [np.where(rng.random((n_img, HW, HW)) < 0.5, targets,
                          rng.integers(0, C, (n_img, HW, HW)))
                 .astype(np.int32) for _ in range(n_att)]
        ints, unis = sea_intersect_union(preds, targets, num_classes=C)
        greedy = worst_case_miou(ints, unis, n_rounds=50)

        start = _miou_from(ints[0].sum(0), unis[0].sum(0))
        assert greedy <= start + 1e-9

        best = 10.0
        for combo in itertools.product(range(n_att), repeat=n_img):
            ci = sum(ints[a, i] for i, a in enumerate(combo))
            cu = sum(unis[a, i] for i, a in enumerate(combo))
            best = min(best, _miou_from(ci, cu))
        # greedy coordinate descent should get close to the optimum
        assert greedy <= best + 0.05


class TestNativeWorstCase:
    def test_native_matches_python_minimum(self, rng):
        from robseg_tpu.native import native_available
        if not native_available("worst_case"):
            pytest.skip("no C++ toolchain")
        n_img, n_att = 6, 3
        targets = rng.integers(0, C, (n_img, HW, HW)).astype(np.int32)
        preds = [np.where(rng.random((n_img, HW, HW)) < 0.5, targets,
                          rng.integers(0, C, (n_img, HW, HW)))
                 .astype(np.int32) for _ in range(n_att)]
        ints, unis = sea_intersect_union(preds, targets, num_classes=C)
        py = worst_case_miou(ints, unis, n_rounds=50, engine="python")
        nat = worst_case_miou(ints, unis, n_rounds=50, engine="native")
        # different shuffle RNGs => trajectories differ; both reach (near)
        # the same greedy minimum on small instances
        assert abs(py - nat) < 0.02
        start = _miou_from(ints[0].sum(0), unis[0].sum(0))
        assert nat <= start + 1e-9

    def test_native_deterministic(self, rng):
        from robseg_tpu.native import native_available
        if not native_available("worst_case"):
            pytest.skip("no C++ toolchain")
        targets = rng.integers(0, C, (4, HW, HW)).astype(np.int32)
        preds = [rng.integers(0, C, (4, HW, HW)).astype(np.int32)
                 for _ in range(2)]
        ints, unis = sea_intersect_union(preds, targets, num_classes=C)
        a = worst_case_miou(ints, unis, n_rounds=20, engine="native",
                            return_selection=True)
        b = worst_case_miou(ints, unis, n_rounds=20, engine="native",
                            return_selection=True)
        assert a[0] == b[0]
        np.testing.assert_array_equal(a[1], b[1])


class TestSEAResume:
    def test_resume_skips_completed_attacks(self, rng, tmp_path):
        fn = _model(rng)
        data = _batches(rng)
        kw = dict(num_classes=C, eps=8 / 255, n_iter=10,
                  weights=np.ones(C, np.float32), seed=1,
                  resume_dir=str(tmp_path))
        r1 = run_sea(fn, lambda: iter(data), **kw)
        import os
        caches = [f for f in os.listdir(tmp_path) if f.startswith("argmax_")]
        assert len(caches) == 3
        r2 = run_sea(fn, lambda: iter(data), **kw)  # all resumed
        assert r2["loss-wise_miou"] == r1["loss-wise_miou"]
        assert np.isclose(r2["final_miou"], r1["final_miou"])
        assert np.isclose(r2["worst_Acc"], r1["worst_Acc"])


class TestEvaluateAPI:
    def test_reference_shaped_tuple(self, rng):
        from robseg_tpu.attacks.sea import evaluate
        fn = _model(rng)
        data = _batches(rng, n=1)
        out = evaluate(fn, iter(data), num_classes=C)
        acc, macc, aacc, f1, mf1, ious, miou = out
        assert acc.shape == (C,) and ious.shape == (C,)
        assert 0 <= aacc <= 1 and 0 <= miou <= 1
