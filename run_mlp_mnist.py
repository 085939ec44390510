"""
Run the MLP example experiment (port of reference run_mlp_mnist.py):
demonstrates the boilerplate for adding a new experiment type.
"""

from coot_videotext_tpu.examples.mlp_mnist import (
    EXP_TYPE, MLPMNISTDataLoader, MLPMNISTExperimentConfig,
    MLPMNISTTrainer, MLPModelManager, make_synthetic_mnist)
from coot_videotext_tpu.utils import arguments
from coot_videotext_tpu.utils.arguments import ArgParser
from coot_videotext_tpu.utils.yaml_utils import load_yaml_config_file


def main():
    parser = ArgParser(description=__doc__)
    arguments.add_default_args(parser)
    arguments.add_exp_identifier_args(parser)
    arguments.add_trainer_args(parser, dataset_path=False)
    parser.add_argument("--load_model", type=str, default=None)
    args = parser.parse_args()

    exp_group, exp_name, config_file = \
        arguments.setup_experiment_identifier_from_args(args, EXP_TYPE)
    config = load_yaml_config_file(config_file)
    config = arguments.update_config_from_args(config, args)
    cfg = MLPMNISTExperimentConfig(config)
    if args.print_config:
        print(cfg)

    (train_x, train_y), (val_x, val_y) = make_synthetic_mnist()
    train_loader = MLPMNISTDataLoader(train_x, train_y,
                                      cfg.train.batch_size, shuffle=True,
                                      seed=cfg.random_seed or 0)
    val_loader = MLPMNISTDataLoader(val_x, val_y, cfg.val.batch_size,
                                    shuffle=False)

    for run_number in range(args.start_run,
                            args.start_run + args.num_runs):
        run_name = f"{args.run_name}{run_number}"
        model_mgr = MLPModelManager(cfg)
        trainer = MLPMNISTTrainer(
            cfg, model_mgr, exp_group, exp_name, run_name,
            len(train_loader), log_dir=args.log_dir, reset=args.reset,
            load_best=args.load_best or args.validate,
            load_epoch=args.load_epoch, load_model=args.load_model,
            is_test=args.validate)
        if args.validate:
            trainer.validate_epoch(val_loader)
        else:
            trainer.train_model(train_loader, val_loader)
        trainer.close()


if __name__ == "__main__":
    main()
