#!/bin/sh
# PIR-AT training launcher; parity: reference run_train.sh
CFG=${1:-configs/pascalvoc_convnext.yaml}
python -m tools.train --cfg "$CFG"
