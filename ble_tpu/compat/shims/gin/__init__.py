"""No-op gin-config shim.

The reference decorates classes/functions with @gin.configurable and binds
parameters from .gin files at CLI startup (reference utils/run_helpers.py:
92-108). For the parity harness we run the reference with its Python
defaults (which mirror the shipped .gin configs for the environment path),
so `configurable` is an identity decorator and the binding entry points
are no-ops. `query_parameter`/`REQUIRED` raise, loudly, if something
actually depends on gin state.
"""

REQUIRED = object()


def configurable(fn_or_name=None, *args, **kwargs):
  del args, kwargs
  if callable(fn_or_name):
    return fn_or_name

  def decorator(fn):
    return fn

  return decorator


def register(fn_or_name=None, *args, **kwargs):
  return configurable(fn_or_name, *args, **kwargs)


def external_configurable(fn, *args, **kwargs):
  del args, kwargs
  return fn


def constant(name, value):
  del name
  return value


def add_config_file_search_path(path):
  del path


def parse_config_files_and_bindings(config_files=None, bindings=None,
                                    **kwargs):
  del kwargs
  if config_files or bindings:
    raise NotImplementedError(
        'gin shim: config files/bindings are not interpreted; the parity '
        'harness runs the reference with Python-default parameters. '
        f'Requested: files={config_files} bindings={bindings}')


def parse_config_file(config_file, **kwargs):
  raise NotImplementedError(f'gin shim: cannot parse {config_file!r}')


def operative_config_str():
  return '# gin shim: no bindings\n'


def query_parameter(name):
  raise NotImplementedError(f'gin shim: no bound parameter {name!r}')


def clear_config():
  pass
