"""The scaled-tier generator's per-copy text perturbation must be unique
for EVERY copy index — a wrapping map table would emit byte-identical
documents across copies, exactly the K-way-duplicate inflation the
perturbation exists to prevent."""

import importlib.util
import pathlib

spec = importlib.util.spec_from_file_location(
    "make_scaled", pathlib.Path(__file__).parent.parent / "tools" / "make_scaled.py"
)
ms = importlib.util.module_from_spec(spec)
spec.loader.exec_module(ms)


def test_vowel_maps_distinct_and_never_identity():
    maps = [ms._vowel_map(i) for i in range(1, 200)]
    assert len(set(maps)) == len(maps)
    assert "aeiou" not in maps
    assert all(len(m) == 5 for m in maps)
    assert all(set(m) <= set(ms._CONSONANTS) for m in maps)


def test_vowel_map_rejects_out_of_space_index():
    import pytest

    with pytest.raises(ValueError):
        ms._vowel_map(len(ms._CONSONANTS) ** 5)
