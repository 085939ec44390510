"""
Show results for original-MART experiment dirs (CLI parity with reference
show_mart.py; the reference points this at the legacy "mart" experiment
type, which maps to the caption experiment layout here).
"""

from coot_videotext_tpu.utils import arguments
from coot_videotext_tpu.utils.arguments import ArgParser
from coot_videotext_tpu.utils.general import (
    LOGGER_NAME, create_logger_without_file)
from coot_videotext_tpu.utils.view_results import (
    TEXT_METRICS, collect_results_data, match_folder, output_results,
    update_performance_profile)

EXP_TYPE = "mart"


def main():
    parser = ArgParser(description=__doc__)
    arguments.add_multi_experiment_args(parser)
    arguments.add_show_args(parser)
    arguments.add_path_args(parser, dataset_path=False)
    arguments.add_default_args(parser)
    args = parser.parse_args()
    create_logger_without_file(LOGGER_NAME, log_level=args.log_level)

    exp_groups_names = match_folder(args.log_dir, EXP_TYPE,
                                    args.exp_group, args.exp_list,
                                    args.search)
    collector = collect_results_data(
        EXP_TYPE, exp_groups_names, log_dir=args.log_dir,
        read_last_epoch=args.last, add_group=args.add_group)
    collector = update_performance_profile(collector)

    default_fields = ["bleu4", "meteo", "rougl", "cider", "re4"]
    output_results(collector, custom_metrics=TEXT_METRICS,
                   metrics=args.metrics, default_metrics=[],
                   fields=args.fields, default_fields=default_fields,
                   mean=args.mean, mean_all=args.mean_all,
                   sort=args.sort, sort_asc=args.sort_asc,
                   compact=args.compact)


if __name__ == "__main__":
    main()
