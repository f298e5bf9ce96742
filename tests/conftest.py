import os
import re
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

#: Heavy end-to-end modules run in their OWN SparkSession so a driver
#: failure there (e.g. an OOM) cannot poison the shared session and
#: cascade into dozens of spurious failures (round-1 VERDICT: one OOM
#: read as 83 failures). Everything else shares one lazily-(re)built
#: session. Only one JVM context is ever live at a time.
_ISOLATED_MODULES = {
    "test_reference_corpus",
    "test_precc_golden",
    "test_entry",
    "test_ann_recall_scale",
}

#: per-module conf overrides for isolated sessions (the 10^5-vector
#: recall corpus needs a bigger heap and all local cores)
_ISOLATED_CONF = {
    "test_ann_recall_scale": {
        "master": "local[16]",
        "shuffle_partitions": 32,
        "memory": "8g",
    },
}

_state: dict = {"shared": None}


def _build(app_name: str, mod: str | None = None):
    from prec_spark.session import _mem_bytes, _running_jvm_max_heap, build_session

    over = _ISOLATED_CONF.get(mod or "", {})
    master = over.get("master", "local[4]")
    want_mem = over.get("memory", "4g")
    # spark.driver.memory binds at JVM launch: in a full run an earlier
    # (4g) module has already launched the gateway, so an 8g request
    # here is silently ignored. build_session re-applies the small-heap
    # guards in that case; we additionally cap parallelism so a module
    # tuned for a big heap doesn't run wide on the small one.
    # Runtime.maxMemory() reads slightly BELOW -Xmx even when the JVM
    # was launched at exactly the requested size, so compare against a
    # 0.9 tolerance, and only ever NARROW the module's requested master
    # (a default-4g module must not be widened from local[4] to
    # local[8] by this guard).
    actual = _running_jvm_max_heap()
    if actual is not None and actual < 0.9 * _mem_bytes(want_mem):
        m = re.fullmatch(r"local\[(\d+)\]", master)
        if m is None or int(m.group(1)) > 8:
            master = "local[8]"
    return build_session(
        app_name=app_name,
        master=master,
        shuffle_partitions=over.get("shuffle_partitions", 8),
        extra_conf={"spark.driver.memory": want_mem},
    )


def _alive(s) -> bool:
    return s is not None and s.sparkContext._jsc is not None


@pytest.fixture(scope="module")
def spark(request):
    mod = request.module.__name__.rsplit(".", 1)[-1]
    if mod in _ISOLATED_MODULES:
        if _alive(_state["shared"]):
            _state["shared"].stop()
        _state["shared"] = None
        isolated = _build(f"prec-spark-{mod}", mod)
        yield isolated
        isolated.stop()
    else:
        if not _alive(_state["shared"]):
            _state["shared"] = _build("prec-spark-tests")
        yield _state["shared"]


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
