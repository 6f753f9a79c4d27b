from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from social_media_data_pipeline_recession_political_sentiment_spark.session import (  # noqa: E402
    get_session,
)

SF_SMOKE = "/root/testdata/sf0.001"

# pytest gets its OWN sweep-fixture dir: an interactive
# tools/degen_sweep.py run concurrent with the suite must not
# rmtree the fixture out from under the sweep smoke test
os.environ.setdefault("SMDP_DEGEN_DIR", "/tmp/smdp_degen_pytest")


@pytest.fixture(scope="session")
def spark():
    s = get_session("pytest", cpus=4)
    yield s
    s.stop()
