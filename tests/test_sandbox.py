"""Static + runtime sandbox gates (functions/sandbox.py)."""

from __future__ import annotations

import pytest

from efficient_llm_data_wrangling_spark.functions.sandbox import (
    SandboxError,
    compile_function,
    validate_source,
)


def test_allows_whitelisted_import():
    src = "import re\ndef f(s):\n    return re.sub('a', 'b', s)\n"
    assert compile_function(src, "f")("aaa") == "bbb"


@pytest.mark.parametrize(
    "src",
    [
        "import os\ndef f(s): return s",
        "from subprocess import run\ndef f(s): return s",
        "def f(s): return eval(s)",
        "def f(s): return open('/etc/passwd').read()",
        "def f(s): return s.__class__.__mro__",
        "def f(s): return __import__('os')",
    ],
)
def test_rejects_dangerous_source(src):
    with pytest.raises(SandboxError):
        validate_source(src)


def test_runtime_import_guard_blocks_aliases():
    # static pass can't see importlib-free aliasing; runtime guard can
    src = "def f(s):\n    import re\n    return 'ok'\n"
    assert compile_function(src, "f")("x") == "ok"


def test_lazy_stdlib_internal_imports_allowed():
    src = (
        "import datetime\n"
        "def f(s):\n"
        "    return datetime.datetime.strptime(s, '%Y-%m-%d').strftime('%b')\n"
    )
    assert compile_function(src, "f")("1997-01-15") == "Jan"


def test_missing_entry_point():
    with pytest.raises(SandboxError, match="entry point"):
        compile_function("def g(s): return s", "f")


def test_restricted_builtins():
    src = "def f(s):\n    return str(len(s))\n"
    assert compile_function(src, "f")("abc") == "3"
