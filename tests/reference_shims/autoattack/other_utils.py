"""Shim of autoattack.other_utils (the git-pinned dependency of the
reference, not installable here). The norm helpers are LOAD-BEARING inside
``semseg/attacker.py`` (L1/L2 step normalization, L1 projection); their
semantics replicate autoattack exactly: flatten all but the batch dim,
optional keepdim broadcast shape."""

import torch


def L0_norm(x):
    return (x != 0.0).view(x.shape[0], -1).sum(-1)


def L1_norm(x, keepdim=False):
    z = x.abs().view(x.shape[0], -1).sum(-1)
    if keepdim:
        z = z.view(-1, *[1] * (len(x.shape) - 1))
    return z


def L2_norm(x, keepdim=False):
    z = (x ** 2).view(x.shape[0], -1).sum(-1).sqrt()
    if keepdim:
        z = z.view(-1, *[1] * (len(x.shape) - 1))
    return z


def L1_projection(x2, y2, eps1):  # unused by attacker.py (it has its own)
    raise NotImplementedError


class Logger:
    def __init__(self, log_path):
        self.log_path = log_path

    def log(self, str_to_log):
        print(str_to_log)
        if self.log_path is not None:
            with open(self.log_path, "a") as f:
                f.write(str_to_log + "\n")
                f.flush()
