"""
Legacy entry point. The reference ships a train_mart.py that is DEAD CODE
(imports the nonexistent mart.trainer_mart and ExperimentTypesConst.MART,
reference train_mart.py:13,19). Original-MART experiments (raw rgb+flow
video features) run through train_caption.py with `coot_model_name: null`
in the config (e.g. config/caption/paper2020/yc2_mart.yaml).
"""

import sys


def main():
    print(__doc__)
    print("Use: python train_caption.py -c <caption config>")
    sys.exit(1)


if __name__ == "__main__":
    main()
