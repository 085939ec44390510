"""
Run captioning training / validation (CLI parity with reference
train_caption.py — same flags, config yaml surface, and output layout).
"""

import random

from coot_videotext_tpu.data.caption_dataset import (
    create_mart_datasets_and_loaders)
from coot_videotext_tpu.tasks.caption.config import MartConfig, MartPathConst
from coot_videotext_tpu.tasks.caption.model_manager import (
    MartModelManager, create_mart_model)
from coot_videotext_tpu.tasks.caption.trainer import MartTrainer
from coot_videotext_tpu.utils import arguments
from coot_videotext_tpu.utils.arguments import ArgParser
from coot_videotext_tpu.utils.general import ExperimentTypesConst
from coot_videotext_tpu.utils.yaml_utils import load_yaml_config_file

EXP_TYPE = ExperimentTypesConst.CAPTION


def add_mart_args(parser) -> None:
    """MART path/preload flags (reference mart/arguments_mart.py)."""
    parser.add_argument("--cache_dir", type=str,
                        default=MartPathConst.CACHE_DIR,
                        help="Cached vocabulary dir.")
    parser.add_argument("--coot_feat_dir", type=str,
                        default=MartPathConst.COOT_FEAT_DIR,
                        help="COOT embeddings dir.")
    parser.add_argument("--annotations_dir", type=str,
                        default=MartPathConst.ANNOTATIONS_DIR,
                        help="Annotations dir.")
    parser.add_argument("--video_feature_dir", type=str,
                        default=MartPathConst.VIDEO_FEATURE_DIR,
                        help="Dir containing the video features.")
    parser.add_argument("--dataset_max", type=int, default=None,
                        help="Reduce dataset size for testing.")
    parser.add_argument("--preload", action="store_true",
                        help="Preload video features.")
    parser.add_argument("--no_preload", action="store_true",
                        help="Do not preload video features.")


def update_mart_config_from_args(config, args, *, verbose=True):
    """(reference mart/arguments_mart.py:28)."""
    if args.dataset_max is not None:
        assert args.dataset_max > 0
        config["dataset_train"]["max_datapoints"] = args.dataset_max
        config["dataset_val"]["max_datapoints"] = args.dataset_max
    if args.preload:
        config["dataset_train"]["preload"] = True
        config["dataset_val"]["preload"] = True
    if args.no_preload or args.validate:
        config["dataset_train"]["preload"] = False
        config["dataset_val"]["preload"] = False
    return config


def main():
    # persistent XLA compile cache (see train_retrieval.py)
    from coot_videotext_tpu.utils.general import enable_compilation_cache
    enable_compilation_cache()

    parser = ArgParser(description=__doc__)
    arguments.add_default_args(parser)
    arguments.add_exp_identifier_args(parser)
    arguments.add_trainer_args(parser, dataset_path=False)
    add_mart_args(parser)
    parser.add_argument("--load_model", type=str, default=None,
                        help="Load model from file.")
    parser.add_argument("--print_model", action="store_true",
                        help="Print model")
    args = parser.parse_args()

    exp_group, exp_name, config_file = \
        arguments.setup_experiment_identifier_from_args(args, EXP_TYPE)
    config = load_yaml_config_file(config_file)
    config = arguments.update_config_from_args(config, args)
    config = update_mart_config_from_args(config, args)

    cfg = MartConfig(config)
    if args.print_config:
        print(cfg)
    if cfg.random_seed is None:
        cfg.random_seed = random.randint(0, 2 ** 15)
        print(f"Random seed: {cfg.random_seed}")

    train_set, val_set, train_loader, val_loader = \
        create_mart_datasets_and_loaders(
            cfg, args.coot_feat_dir, args.annotations_dir,
            args.video_feature_dir, seed=cfg.random_seed)

    for run_number in range(args.start_run,
                            args.start_run + args.num_runs):
        run_name = f"{args.run_name}{run_number}"
        model = create_mart_model(
            cfg, len(train_set.word2idx), cache_dir=args.cache_dir,
            dataset_name=cfg.dataset_train.name)
        model_mgr = MartModelManager(cfg, model)

        load_best = args.load_best or args.validate
        trainer = MartTrainer(
            cfg, model_mgr, exp_group, exp_name, run_name,
            len(train_loader), log_dir=args.log_dir,
            annotations_dir=args.annotations_dir, reset=args.reset,
            load_best=load_best, load_epoch=args.load_epoch,
            load_model=args.load_model, is_test=args.validate)

        try:
            if args.validate:
                if not trainer.load and not args.ignore_untrained:
                    raise ValueError(
                        "Validating an untrained model! No checkpoints were "
                        "loaded. Add --ignore_untrained to validate anyway.")
                trainer.validate_epoch(val_loader)
            else:
                trainer.train_model(train_loader, val_loader)
        except BaseException:
            # surface the traceback in logs/run_*.log so a detached run
            # that dies is diagnosable from the experiment dir alone
            trainer.logger.exception("Run aborted by uncaught exception:")
            raise
        trainer.close()
        del model, model_mgr, trainer


if __name__ == "__main__":
    main()
