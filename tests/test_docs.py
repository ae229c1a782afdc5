"""Documentation gates: README snippets + docstring examples must run.

The reference compiles and runs its README through rustdoc
(`#![doc = include_str!("../README.md")]`, /root/reference/src/lib.rs:1)
and its pre-commit runs `cargo test --doc`; the Python analog executes
every ```python block of README.md sequentially in one namespace, and
runs the doctest examples of the public modules.
"""

import doctest
import os
import re

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _python_blocks(text: str):
    return re.findall(r"```python\n(.*?)```", text, flags=re.DOTALL)


@pytest.mark.slow
def test_readme_python_blocks_execute():
    with open(os.path.join(ROOT, "README.md")) as f:
        blocks = _python_blocks(f.read())
    assert blocks, "README has no python blocks?"
    ns: dict = {}
    for i, block in enumerate(blocks):
        try:
            exec(compile(block, f"README.md:block{i}", "exec"), ns)
        except Exception as e:  # pragma: no cover - failure formatting
            raise AssertionError(
                f"README block {i} failed: {e}\n---\n{block}"
            ) from e


def test_module_doctests():
    import phastft_tpu.fft as fft_mod

    for mod in (fft_mod,):
        result = doctest.testmod(mod, optionflags=doctest.ELLIPSIS)
        assert result.failed == 0, f"{mod.__name__}: {result}"
        assert result.attempted > 0, f"{mod.__name__} lost its examples"
