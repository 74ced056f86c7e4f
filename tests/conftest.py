import glob
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cmc_knowledge_graph_text2ttl_spark.workflow.compile import (
    compile_workflow,
    compile_workflow_file,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="session")
def spark():
    from cmc_knowledge_graph_text2ttl_spark.session import get_spark

    s = get_spark(
        app_name="kg-tests",
        master="local[4]",
        shuffle_partitions=8,
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def fixture_programs():
    paths = sorted(glob.glob(os.path.join(REPO, "fixtures", "workflows", "*.yaml")))
    return [compile_workflow_file(p, index=i) for i, p in enumerate(paths)]


def wf(source: str, name: str = "wf", index: int = 0):
    return compile_workflow(source, name=name, index=index)
