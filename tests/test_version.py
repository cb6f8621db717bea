"""The package __version__ is a cache key (driver_api index caches under
/tmp are keyed on it); pyproject.toml must stay in lockstep so installed
metadata and runtime cache keys can't diverge."""

import pathlib
import re

import markdown_query_ray


def test_pyproject_version_matches_package():
    pyproject = pathlib.Path(__file__).resolve().parent.parent / "pyproject.toml"
    m = re.search(r'^version = "([^"]+)"', pyproject.read_text(), re.M)
    assert m, "pyproject.toml has no version line"
    assert m.group(1) == markdown_query_ray.__version__
