#!/bin/sh
# SEA evaluation launcher; parity: reference run_infer.sh (eps passed in /255)
# usage: sh run_infer.sh <eps> [config]
EPS=${1:-8}
CFG=${2:-configs/pascalvoc_convnext.yaml}
python -m tools.infer --cfg "$CFG" --eps "$EPS" --n_iter 300
