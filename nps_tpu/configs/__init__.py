"""Config system (mirrors the reference's ``src/configs``).

Config files are executable Python modules exporting a module-level
``parser``; every nested key of every config group is addressable from the
CLI as ``--group.sub.key=value`` (lists as ``--group[i].key``), with
type-preserving coercion and whole-group preset swaps via ``--group=Name``.
Semantics preserved verbatim per SURVEY.md §5 / BASELINE.json.
"""

from nps_tpu.configs.parse import parse_args, parse_arg_default, unflatten  # noqa: F401
from nps_tpu.configs.parse_component import (  # noqa: F401
    parse_base, compose_config, load_config_modules)
