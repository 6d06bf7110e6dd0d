"""Execution-function machinery: load the user's transform callable from a
module path, a source-code body, or a file, introspect its signature, and
bind inputs by name.

Reference: ``core/execution/spark_task/execution_fn.py:8-199`` (loading),
``operator/spark_task/execution.py:103-146`` (argument validation and
name-based input binding), ``:120-131`` (output validation).
"""

from __future__ import annotations

import importlib
import importlib.util
import inspect
import uuid
from collections.abc import Callable, Mapping
from typing import Any

from pyspark.sql import DataFrame


class ExecutionFunctionError(Exception):
    pass


def load_function(name: str, *, module: str | None = None,
                  body: str | None = None, file: str | None = None) -> Callable:
    """Load ``name`` from exactly one of: an importable module, an exec'd
    source string, or a python file path."""
    if module is not None:
        mod = importlib.import_module(module)
        fn = getattr(mod, name, None)
    elif body is not None:
        namespace: dict[str, Any] = {}
        exec(compile(body, f"<execution:{name}>", "exec"), namespace)
        fn = namespace.get(name)
    elif file is not None:
        spec = importlib.util.spec_from_file_location(f"exec_{uuid.uuid4().hex}", file)
        if spec is None or spec.loader is None:
            raise ExecutionFunctionError(f"cannot load execution file {file}")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        fn = getattr(mod, name, None)
    else:
        raise ExecutionFunctionError("one of module/body/file is required")
    if not callable(fn):
        raise ExecutionFunctionError(f"execution function '{name}' not found")
    return fn


def bind_arguments(fn: Callable, inputs: Mapping[str, DataFrame],
                   extra_arguments: Mapping[str, Any] | None = None) -> dict[str, Any]:
    """Bind DataFrames to parameters by input name, then extra arguments,
    honoring defaults; missing required parameters raise (reference
    validation, ``execution.py:103-118``)."""
    sig = inspect.signature(fn)
    extra = dict(extra_arguments or {})
    bound: dict[str, Any] = {}
    for pname, param in sig.parameters.items():
        if param.kind in (param.VAR_POSITIONAL, param.VAR_KEYWORD):
            continue
        if pname in inputs:
            bound[pname] = inputs[pname]
        elif pname in extra:
            bound[pname] = extra[pname]
        elif param.default is not param.empty:
            continue
        else:
            raise ExecutionFunctionError(
                f"execution function parameter '{pname}' has no matching input, "
                f"extra argument, or default (inputs: {sorted(inputs)})")
    return bound


def validate_outputs(result: Any, output_names: list[str]) -> dict[str, DataFrame]:
    """The user function must return a DataFrame (single output) or a dict
    of {output_name: DataFrame} (reference ``execution.py:120-131``)."""
    if isinstance(result, DataFrame):
        if len(output_names) != 1:
            raise ExecutionFunctionError(
                f"single DataFrame returned but task declares outputs {output_names}")
        return {output_names[0]: result}
    if isinstance(result, Mapping):
        missing = [n for n in output_names if n not in result]
        bad = [n for n, v in result.items() if not isinstance(v, DataFrame)]
        if missing or bad:
            raise ExecutionFunctionError(
                f"execution result invalid: missing outputs {missing}, "
                f"non-DataFrame values {bad}")
        return {n: result[n] for n in output_names}
    raise ExecutionFunctionError(
        f"execution must return DataFrame or dict[str, DataFrame], got {type(result)}")
