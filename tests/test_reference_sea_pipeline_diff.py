"""Differential test of the FULL SEA driver protocol against the
reference's own ``tools/infer.py`` chain (VERDICT round-3 Next #1).

The pieces were each proven (model logits, complete ``apgd_largereps``
trajectories, the ``evalSEA`` aggregation) — this closes the glue they run
through: the reference driver's actual ``eval_performance`` (running
per-class stats + ignore-masked pred storage, ``infer.py:56-133``),
``evaluate`` (per-batch attack -> adv_loader protocol, ``infer.py:136-155``),
the per-loss attack partial (``infer.py:338-351``), the argmax-store ->
``evalSEA`` hand-off (``infer.py:366-403``) and the final dict assembly
(``infer.py:383-403``) — imported and EXECUTED from
``/root/reference/tools/infer.py``, vs our ``run_sea`` end-to-end, on shared
converted UperNet weights, ``use_rs=False``, f64, reduced n_iter.

A second test diffs the eval data path at driver geometry: the reference's
own VOC val dataset + sequential loader (``infer.py:158-192,285-294``) vs
ours, batch-for-batch, on a fixture VOC tree.
"""

import importlib.util
import os
import random
import sys
import types
from functools import partial

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from robseg_tpu import models
from robseg_tpu.attacks.sea import run_sea
from robseg_tpu.convert import convert_upernet

_SHIMS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "reference_shims")
_REF = "/root/reference"


@pytest.fixture(scope="module")
def ref_infer():
    """``/root/reference/tools/infer.py`` imported as a real module.

    Its ``from .worse_only import evalSEA`` needs a package context, so a
    synthetic package pointing at the reference's tools/ dir is registered
    (our own repo has a colliding ``tools`` package).
    """
    path = os.path.join(_REF, "tools", "infer.py")
    if not os.path.isfile(path):
        pytest.skip("reference repo not present")
    for p in (_SHIMS, _REF):
        if p not in sys.path:
            sys.path.insert(0, p)
    pkg = types.ModuleType("ref_tools_pkg")
    pkg.__path__ = [os.path.join(_REF, "tools")]
    sys.modules.setdefault("ref_tools_pkg", pkg)
    spec = importlib.util.spec_from_file_location("ref_tools_pkg.infer", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_tools_pkg.infer"] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture()
def cpu_cuda(monkeypatch):
    """The driver hardcodes ``.to('cuda')`` (``infer.py:82,144-145``) —
    route those to the CPU tensor unchanged."""
    orig_to = torch.Tensor.to

    def _to(self, *args, **kwargs):
        if args and (args[0] == "cuda"
                     or (isinstance(args[0], torch.device)
                         and args[0].type == "cuda")):
            return self
        return orig_to(self, *args, **kwargs)

    monkeypatch.setattr(torch.Tensor, "to", _to)


class _TargetDataset(torch.utils.data.Dataset):
    def __init__(self, targets):
        self.targets = targets

    def __len__(self):
        return self.targets.shape[0]

    def __getitem__(self, i):
        return torch.zeros(1), torch.from_numpy(self.targets[i]).long()


N_CLS = 8
EPS = 8.0 / 255.0
N_ITER = 15
BS = 2


class TestReferenceSEAPipelineDiff:
    # The f64 CPU compile of the full UperNet _apgd_core (weights embedded
    # as jit constants) is single-threaded in XLA's folding passes: >1h on
    # a 1-core host (round-5), ~10 min on the round-4 box. The watchdog
    # must not hard-exit the suite for a legitimately slow compile.
    @pytest.mark.timeout_s(10800)
    def test_full_driver_protocol_matches(self, ref_infer, cpu_cuda, rng,
                                          tmp_path):
        import semseg

        # ---- shared model: reference torch UperNet -> our converter ----
        torch.manual_seed(11)
        tm = semseg.models.UperNetForSemanticSegmentation(
            "ConvNeXt-T_CVST", n_cls=N_CLS, pretrained=None).double().eval()
        g = torch.Generator().manual_seed(0)
        for name, buf in tm.named_buffers():
            if name.endswith("running_mean"):
                buf.copy_(torch.randn(buf.shape, generator=g).double() * 0.2)
            elif name.endswith("running_var"):
                buf.copy_(torch.rand(buf.shape, generator=g).double() + 0.5)
        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        params, stats = convert_upernet(sd, "T_CVST")
        module = models.build_model("UperNetForSemanticSegmentation",
                                    "ConvNeXt-T_CVST", N_CLS)
        variables = {"params": params, "batch_stats": stats}
        jax_fn = lambda xx: module.apply(variables, xx)  # noqa: E731

        # ---- shared data: 2 batches x 2 images, labels from clean argmax
        # with ignore pixels, exactly what both drivers consume ----
        xs = rng.random((4, 64, 64, 3)).astype(np.float64)
        with torch.no_grad():
            ys = tm(torch.from_numpy(np.moveaxis(xs, -1, 1).copy())
                    ).argmax(1).numpy().astype(np.int32)
        ys[:, :2, :3] = -1  # exercise the ignore-masked storage protocol
        w = np.abs(rng.normal(size=(N_CLS,))) + 0.5

        batches = [(xs[i:i + BS], ys[i:i + BS]) for i in range(0, 4, BS)]

        def torch_loader():
            return [(torch.from_numpy(np.moveaxis(x, -1, 1).copy()).double(),
                     torch.from_numpy(y.astype(np.int64)), 0)
                    for x, y in batches]

        # ---- reference driver chain, verbatim protocol (infer.py:313-403)
        clean_ref, _ = ref_infer.eval_performance(
            tm, torch_loader(), n_batches=-1, n_cls=N_CLS, ignore_index=-1)

        args = types.SimpleNamespace(norm="Linf")
        tw = torch.from_numpy(w).double()
        loss_wise_logits, indiv_mious, ref_loss_stats = [], [], []
        for loss_ in ("mask-ce-bal", "mask-ce-avg", "js-avg"):
            attack_fn = partial(
                semseg.attacker.apgd_largereps, norm="Linf", eps=EPS,
                n_iter=N_ITER, n_restarts=1, use_rs=False, loss=loss_,
                verbose=False, track_loss="ce-avg", log_path=None,
                num_classes=N_CLS, early_stop=True)
            adv_loader = ref_infer.evaluate(
                torch_loader(), tm, attack_fn, -1, args, tw)
            adv_stats, l_outs = ref_infer.eval_performance(
                tm, adv_loader, -1, n_cls=N_CLS, ignore_index=-1)
            loss_wise_logits.append(l_outs.detach().cpu())
            indiv_mious.append(adv_stats["mIoU"])
            ref_loss_stats.append(adv_stats)

        os.makedirs(os.path.join(str(tmp_path), "ref", "test_results"),
                    exist_ok=True)
        save_dict = {"seed": 225, "worst_Acc": 0, "worst_Acc_indiv": 0,
                     "final_miou": 0, "loss-wise_miou": indiv_mious}
        evall = ref_infer.evalSEA(
            val_data=_TargetDataset(ys), l_outs=loss_wise_logits, eps=8,
            n_cls=N_CLS, addendum="SEA_diff",
            saveDir=os.path.join(str(tmp_path), "ref"),
            saveDict=save_dict, modelName="diffmodel")
        evall.worse_case_eval(bs=BS, n_batches=-1)
        random.seed(225)  # the driver's module-level seeding discipline
        evall.worst_case_miou()

        # ---- our driver chain: ONE call (attacks/sea.py::run_sea) ----
        make_loader = lambda: iter(batches)  # noqa: E731
        jax.config.update("jax_enable_x64", True)
        try:
            got = run_sea(jax_fn, make_loader, num_classes=N_CLS, eps=EPS,
                          n_iter=N_ITER, weights=w, n_batches=-1, seed=225,
                          use_rs=False, early_stop=True,
                          wc_engine="reference-python",
                          resume_dir=str(tmp_path / "ours"), cache_tag="d")
        finally:
            jax.config.update("jax_enable_x64", False)

        # 1. the stored argmax predictions (the evalSEA inputs) must be
        #    BIT-identical per attack, ignore-masking included
        for li, loss_ in enumerate(("mask-ce-bal", "mask-ce-avg", "js-avg")):
            cache = np.load(os.path.join(
                str(tmp_path / "ours"),
                f"argmax_d_{loss_}_{EPS:.6f}_{N_ITER}.npz"))
            np.testing.assert_array_equal(
                cache["preds"].astype(np.int64),
                loss_wise_logits[li].numpy(), err_msg=loss_)

        # 2. clean stats (running per-class protocol vs confusion matrix)
        for k in ("mAcc", "aAcc", "mIoU"):
            assert abs(got["clean"][k] - clean_ref[k]) < 1e-6, (k, got, clean_ref)

        # 3. per-loss adversarial stats + loss-wise mIoU list
        for st_ref, st_got in zip(ref_loss_stats, got["loss-wise_stats"]):
            for k in ("mAcc", "aAcc", "mIoU"):
                assert abs(st_got[k] - st_ref[k]) < 1e-6, (k, st_got, st_ref)
        np.testing.assert_allclose(got["loss-wise_miou"],
                                   evall.saveDict["loss-wise_miou"],
                                   atol=1e-6)

        # 4. the final dict: worst-case aAcc and the greedy worst-case mIoU
        assert abs(got["worst_Acc"] - evall.saveDict["worst_Acc"]) < 1e-6
        np.testing.assert_allclose(
            got["worst_Acc_indiv"],
            np.asarray(evall.saveDict["worst_Acc_indiv"]), atol=1e-6)
        assert abs(got["final_miou"]
                   - evall.saveDict["final_miou"]) < 1e-9, (
            got["final_miou"], evall.saveDict["final_miou"])


class TestReferenceValLoaderDiff:
    def test_voc_val_geometry_and_order_match(self, tmp_path):
        """Eval-geometry / loader-order discipline (``infer.py:158-192,
        285-294``): the reference's own VOC val dataset + sequential loader
        vs ours, batch-for-batch at the driver's 512/473 geometry."""
        for p in (_SHIMS, _REF):
            if p not in sys.path:
                sys.path.insert(0, p)
        if not os.path.isdir(os.path.join(_REF, "semseg")):
            pytest.skip("reference repo not present")
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))))
        from tools.make_fixture_dataset import make_voc
        import torchvision  # the shim; ToTensor matches torchvision's
        from semseg.datasets import get_segmentation_dataset as ref_get
        from robseg_tpu.data import (get_segmentation_dataset,
                                     simple_eval_loader)

        root = str(tmp_path / "voc")
        make_voc(root, n_train=2, n_val=6, hw=(375, 500))

        ref_ds = ref_get("pascalvoc", root=root, split="val",
                         transform=torchvision.transforms.ToTensor(),
                         base_size=512, crop_size=(473, 473))
        ref_loader = torch.utils.data.DataLoader(
            ref_ds, batch_size=2, shuffle=False, num_workers=0)

        ours = get_segmentation_dataset("pascalvoc", root=root, split="val",
                                        mode="val", base_size=512,
                                        crop_size=(473, 473))
        our_batches = list(simple_eval_loader(ours, 2))
        assert len(our_batches) == 3

        for (rx, ry, *_), (ox, oy) in zip(ref_loader, our_batches):
            np.testing.assert_allclose(
                np.moveaxis(rx.numpy(), 1, -1), ox, atol=1e-6)
            np.testing.assert_array_equal(ry.numpy(), oy)
