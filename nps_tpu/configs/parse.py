"""The config/flag engine.

Behavioral parity with ``src/configs/parse.py`` (the reference's most
distinctive subsystem; its override semantics must be preserved verbatim —
SURVEY.md §5):

- a config file is an executable module exporting ``parser``;
- every leaf of every nested config group becomes a ``--group.key`` /
  ``--group[i].key`` flag whose default is the config value;
- type coercion derives from the config default's type, with
  ``ast.literal_eval`` for bracketed lists and permissive bool parsing;
- a bare group flag (``--optimizer=Adam``) swaps in a whole preset from
  ``configs/train/defaults/<group>.py`` (executed with ``base_args``
  injected); the config's own group values are then suppressed but later
  CLI overrides for that group's keys still apply;
- ``unflatten`` rebuilds the nested dict (lists via ``__is_list__``
  markers).
"""

import argparse
import ast
import importlib
import importlib.util
import sys
import types
from argparse import Namespace
from copy import copy

from nps_tpu.configs.module_loader import load_module_safe
from nps_tpu.utils.seed import set_seed

# root package(s) under which `<pkg>.train.defaults.<group>` presets live;
# 'configs' resolves when the CLI registers the top-level alias.
DEFAULTS_ROOTS = ["configs", "nps_tpu.configs"]


class ConfigGroupArg:
    """Marks a value as originating from the config file (not argv)."""

    def __init__(self, v):
        self.v = v

    def __call__(self):
        return self.v


def add_arguments(parser, cfg):
    for k, v in cfg.items():
        parser.add_argument("--" + k, type=parse_arg_default(type(v)),
                            default=v)


def get_custom_group_titles(parser):
    default_groups = ["positional arguments", "optional arguments", "options"]
    return [g.title for g in parser._action_groups
            if g.title not in default_groups]


def _is_containerish(v):
    return isinstance(v, (dict, list, tuple))


def add_group(parser, base_args, cfg, group_name):
    group = parser.add_argument_group(group_name)
    # the bare group flag must be registered first (parsing-order dependent)
    parser.add_argument(f"--{group_name}", type=str, default=None)

    if isinstance(cfg, dict):
        items = cfg.items()
        sub_name = lambda k: f"{group_name}.{k}"      # noqa: E731
        flag_name = lambda k: f"--{group_name}.{k}"    # noqa: E731
    elif isinstance(cfg, (list, tuple)):
        items = enumerate(cfg)
        sub_name = lambda k: f"{group_name}[{k}]"      # noqa: E731
        flag_name = lambda k: f"--{group_name}[{k}]"   # noqa: E731
    else:
        raise ValueError("'cfg' must be dict, list or tuple")

    for k, v in items:
        help_ = argparse.SUPPRESS if k in base_args else None
        if isinstance(v, dict) and len(v) > 0:
            add_group(parser, base_args, v, sub_name(k))
        elif isinstance(v, (list, tuple)) and any(_is_containerish(x)
                                                  for x in v):
            add_group(parser, base_args, v, sub_name(k))
        else:
            group.add_argument(flag_name(k), type=parse_arg_default(type(v)),
                               default=ConfigGroupArg(v), help=help_)


def flatten(d, parent_key="", sep="."):
    if isinstance(d, (types.SimpleNamespace, Namespace)):
        d = d.__dict__
    items = []
    for k, v in d.items():
        new_key = parent_key + sep + k if parent_key else k
        if isinstance(v, (dict, types.SimpleNamespace, Namespace)):
            items.extend(flatten(v, new_key, sep=sep).items())
        else:
            items.append((new_key, v))
    return dict(items)


def get_defaults(key, value, base_args):
    last_err = None
    for root in DEFAULTS_ROOTS:
        module_name = f"{root}.train.defaults.{key}"
        try:
            module = load_module_safe(module_name, base_args=base_args)
        except (ImportError, ModuleNotFoundError, ValueError) as e:
            last_err = e
            continue
        try:
            return getattr(module, value)
        except AttributeError:
            raise Exception(
                f"Error loading default for '--{key}': '{value}' cannot be "
                f"found in '{module_name}'")
    raise Exception(f"Cannot locate defaults module for group '{key}' "
                    f"({last_err})")


def parse_list(part):
    """'name' -> (name, -1); 'name[5]' -> (name, 5)."""
    if part.endswith("]"):
        idx = int(part[part.index("[") + 1:part.index("]")])
        return part[:part.index("[")], idx
    return part, -1


def parse_boolean(value):
    value = str(value).lower()
    if value in ("true", "t", "yes", "y", "1"):
        return True
    if value in ("false", "f", "no", "n", "0"):
        return False
    raise ValueError(f"Invalid boolean value: {value}")


def parse_arg_default(default_type):
    """Type coercion keyed on the config default's type."""

    def parse_arg(arg):
        s = str(arg)
        if s and s[0] == "[" and s[-1] == "]":
            return ast.literal_eval(s)
        if isinstance(None, default_type):  # default was None -> keep str
            return str(arg)
        if default_type is bool:
            return parse_boolean(arg)
        # Rich config values (e.g. activation objects) opt into string
        # overrides via a `_parse_override` classmethod — the reference
        # parser cannot override such values at all (`default_type(arg)`
        # on a torch activation class raises), so this is an extension,
        # not a divergence: `--model.activation=gelu_tanh`.
        if hasattr(default_type, "_parse_override"):
            return default_type._parse_override(arg)
        return default_type(arg)

    return parse_arg


def unflatten(d, parser, sep="."):
    assert isinstance(d, dict)
    result = {}
    argument_groups = get_custom_group_titles(parser)
    groups_overridden = set()
    base_args = None
    base_args_parsed = False

    for key, value in d.items():
        if key in argument_groups:
            if not base_args_parsed:
                # first group marker: everything before it was a base arg
                base_args_parsed = True
                base_args = Namespace(**dict(result))
            if value is not None:  # --group=PresetName swap
                result[key] = get_defaults(key, value, base_args)
                groups_overridden.add(key)
            continue

        if isinstance(value, ConfigGroupArg):
            value = value()
            from_config = True
        else:
            from_config = False

        parts = key.split(sep)
        # split fused bracket segments 'a[0][1]' -> 'a[0]', '[1]'
        expanded = []
        for p in parts:
            if p.count("]") > 1:
                expanded.extend(x + "]" for x in p.split("]")[:-1])
            else:
                expanded.append(p)
        parts = expanded

        if parts[0] in groups_overridden and from_config:
            # preset swap suppresses config-file values for this group, but
            # explicit CLI overrides still land
            continue

        node = result
        for part in parts[:-1]:
            name, idx = parse_list(part)
            if idx == -1:
                node = node.setdefault(name, {})
            else:
                lst = node.setdefault(name, {"__is_list__": True})
                node = lst.setdefault(idx, {})
        name, idx = parse_list(parts[-1])
        if idx == -1:
            node[parts[-1]] = value
        else:
            lst = node.setdefault(name, {"__is_list__": True})
            lst[idx] = value

    result = remove_dummy_dict(result, dummy="")
    result = flatten_dict_to_list(result, "__is_list__", True)
    return result


def remove_dummy_dict(d, dummy):
    if not isinstance(d, dict):
        return d
    if len(d) == 1 and dummy in d:
        return list(d.values())[0]
    return {k: remove_dummy_dict(v, dummy) for k, v in d.items()}


def flatten_dict_to_list(d, key, value):
    if not isinstance(d, dict):
        return d
    if key in d and d[key] == value:
        d = dict(d)
        d.pop(key)
        assert sorted(d.keys()) == list(range(len(d))), \
            "dictionary contains non-index keys"
        return [flatten_dict_to_list(d[i], key, value) for i in range(len(d))]
    return {k: flatten_dict_to_list(v, key, value) for k, v in d.items()}


def get_config_from_sys_argv():
    argv = sys.argv
    if "--config" in argv:
        index = argv.index("--config")
    elif "-C" in argv:
        index = argv.index("-C")
    else:
        raise Exception("No config file specified (use -C or --config).")
    config_file = argv[index + 1]
    sys.argv = argv[:index] + argv[index + 2:]
    return config_file


def config_file_to_module(config_file):
    mod = config_file.replace("/", ".")
    if mod.endswith(".py"):
        mod = mod[:-3]
    return mod


def parse_args(config_file=None):
    if config_file is None:
        config_file = get_config_from_sys_argv()
    try:
        # execute the config module FRESH each parse: its parser defaults
        # are derived from sys.argv at execution time (stage-1 base parse),
        # so a cached import would bake a previous call's overrides into
        # this one (bites notebooks/tests that parse repeatedly in-process;
        # the one-shot CLI never notices)
        mod_name = config_file_to_module(config_file)
        spec = importlib.util.find_spec(mod_name)
        module = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(module)
        parser = copy(module.parser)
    except (ModuleNotFoundError, AttributeError):
        raise Exception(f"Cannot access 'parser' attribute of {config_file}")
    args = parser.parse_args()
    args = unflatten(vars(args), parser)
    print(f"Loaded config: {config_file} {' '.join(sys.argv[1:])}")
    set_seed(args["seed"])
    print(f"Set seed to {args['seed']}")
    return args
