from coot_videotext_tpu.utils.general import (
    REF, ConfigNamesConst, LOGGER_NAME, MetricComparisonConst,
    TrainerPathConst, check_config_dict, create_logger,
    get_dict_value_recursively, get_timestamp_for_filename, remove_handlers,
    resolve_sameas_config_recursively)
from coot_videotext_tpu.utils.yaml_utils import (
    dump_yaml_config_file, load_yaml_config_file)

__all__ = [
    "REF", "ConfigNamesConst", "LOGGER_NAME", "MetricComparisonConst",
    "TrainerPathConst", "check_config_dict", "create_logger",
    "get_dict_value_recursively", "get_timestamp_for_filename",
    "remove_handlers", "resolve_sameas_config_recursively",
    "dump_yaml_config_file", "load_yaml_config_file",
]
