"""Service-mesh tests: payload codec, job manager DAG semantics, and a live
end-to-end in-process service round trip with tiny models."""

import threading
import time

import numpy as np
import pytest

from diffusionhandles_tpu.service.base import (decode_payload,
                                               encode_payload)
from diffusionhandles_tpu.service.job_manager import Job, JobManager


def test_payload_roundtrip():
    rng = np.random.RandomState(0)
    payload = {
        "img": rng.rand(2, 3, 4).astype(np.float32),
        "ids": np.arange(5, dtype=np.int64),
        "blob": b"\x00\x01binary",
        "nested": {"x": 1.5, "list": [np.float32(2.0), "s"]},
    }
    import json
    encoded = json.loads(json.dumps(encode_payload(payload)))
    decoded = decode_payload(encoded)
    np.testing.assert_array_equal(decoded["img"], payload["img"])
    assert decoded["img"].dtype == np.float32
    np.testing.assert_array_equal(decoded["ids"], payload["ids"])
    assert decoded["blob"] == payload["blob"]
    assert decoded["nested"]["x"] == 1.5


def test_job_manager_dag_ordering():
    order = []

    jm = JobManager(poll_interval=0.01)
    a = Job(lambda: order.append("a") or "A")
    b = Job(lambda: (time.sleep(0.05), order.append("b"))[0] or "B")
    jm.add_job(a)
    jm.add_job(b)

    def after_both(ja, jb):
        order.append("after")
        jm.add_job(Job(lambda: order.append("chained")))

    jm.add_callback([a, b], after_both)
    jm.run()
    assert order.index("after") > order.index("a")
    assert order.index("after") > order.index("b")
    assert order[-1] == "chained"


def test_job_manager_timeout():
    jm = JobManager(poll_interval=0.01)
    jm.add_job(Job(lambda: time.sleep(5), timeout=0.1))
    with pytest.raises(TimeoutError):
        jm.run()
    jm.shutdown()


def test_job_manager_propagates_exceptions():
    jm = JobManager(poll_interval=0.01)

    def boom():
        raise ValueError("kaboom")

    jm.add_job(Job(boom))
    with pytest.raises(ValueError, match="kaboom"):
        jm.run()


@pytest.mark.slow
def test_client_surfaces_handler_errors_without_retry():
    """A handler exception answers HTTP 500 with {error, traceback} in the
    body; the client must raise it as an application error carrying the
    server-side message — NOT retry it as a transport failure (retrying
    re-runs the failed computation behind the model lock) and NOT reduce
    it to a bare 'HTTP Error 500'."""
    pytest.importorskip("aiohttp")
    from diffusionhandles_tpu.service.base import Webapp
    from diffusionhandles_tpu.service.client import ServiceClient

    calls = []

    class Failing(Webapp):
        def __init__(self):
            super().__init__(port=18897)
            def boom(req):
                calls.append(1)
                raise ValueError("bad input shape (7,)")
            self.route("boom", boom)

    Failing().start_background()
    client = ServiceClient("http://127.0.0.1:18897", retries=2,
                           retry_backoff=0.01)
    assert client.wait_healthy(timeout=30)
    with pytest.raises(RuntimeError, match="bad input shape"):
        client.call("boom", x=1)
    assert len(calls) == 1  # application errors are not retried


def test_live_service_roundtrip():
    """Spin up remover + depth services in-process (tiny models) and hit
    them over real HTTP."""
    aiohttp = pytest.importorskip("aiohttp")
    from diffusionhandles_tpu.models.lama import (LamaInpainter,
                                                  tiny_lama_config)
    from diffusionhandles_tpu.models.zoedepth import (ZoeDepthEstimator,
                                                      tiny_zoedepth_config)
    from diffusionhandles_tpu.service.services import (
        DepthEstimatorWebapp, ForegroundRemoverWebapp)
    from diffusionhandles_tpu.service.client import (
        DepthEstimatorClient, ForegroundRemoverClient)

    depth_app = DepthEstimatorWebapp(
        ZoeDepthEstimator(tiny_zoedepth_config()), port=18890)
    remover_app = ForegroundRemoverWebapp(
        LamaInpainter(tiny_lama_config()), port=18891)
    depth_app.start_background()
    remover_app.start_background()

    rng = np.random.RandomState(0)
    img = rng.rand(1, 3, 32, 32).astype(np.float32)
    depth = DepthEstimatorClient("http://127.0.0.1:18890").estimate_depth(
        img)
    assert depth.shape == (1, 1, 32, 32)
    mask = np.zeros((1, 1, 32, 32), np.float32)
    mask[..., 8:16, 8:16] = 1
    bg = ForegroundRemoverClient(
        "http://127.0.0.1:18891").remove_foreground(img, mask, dilation=0)
    assert bg.shape == img.shape
    outside = mask[0, 0] == 0
    np.testing.assert_allclose(bg[0, :, outside], img[0, :, outside],
                               atol=1e-5)


@pytest.mark.slow
def test_live_langsam_selector_service():
    """The foreground-selector service backed by the full LangSAM stack
    (tiny GroundingDINO grounder -> tiny SAM), over real HTTP."""
    pytest.importorskip("aiohttp")
    from diffusionhandles_tpu.models.groundingdino import (
        GroundingDinoGrounder, tiny_gdino_config)
    from diffusionhandles_tpu.models.sam import (PromptableSegmenter,
                                                 tiny_sam_config)
    from diffusionhandles_tpu.models.segmenter import LangSamSegmenter
    from diffusionhandles_tpu.service.client import ForegroundSelectorClient
    from diffusionhandles_tpu.service.services import (
        ForegroundSelectorWebapp)

    selector = LangSamSegmenter(
        grounder=GroundingDinoGrounder(tiny_gdino_config(), input_size=64),
        sam=PromptableSegmenter(tiny_sam_config()))
    app = ForegroundSelectorWebapp(selector=selector, port=18894)
    app.start_background()

    rng = np.random.RandomState(0)
    img = rng.rand(1, 3, 64, 64).astype(np.float32)
    mask = ForegroundSelectorClient(
        "http://127.0.0.1:18894").select_foreground(img, "a toy robot")
    assert mask.shape == (1, 1, 64, 64)
    assert set(np.unique(mask)) <= {0.0, 1.0}
