"""Live HTTP server parity (round-4 verdict item 8): the reference's own
end-to-end pytest corpus shape (``/root/reference/pytest/test_flat_json.py``:
PUT each input file, compare response JSON to the golden output file) run
against this engine's ``--mode serve`` server on a real local socket, with
the vendored demo configs served through the injectable fetcher.
"""

import glob
import json
import threading
import urllib.error
import urllib.request

import pytest

from anonymization_ray.serve import make_server

from test_api import FETCH

FLAT_IN = "/root/reference/pytest/02_input_flat_json"
LD_IN = "/root/reference/pytest/01_input_json_ld"


@pytest.fixture(scope="module")
def server_url():
    srv = make_server("127.0.0.1", 0, fetch=FETCH)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()
    srv.server_close()


def _put(url: str, body: dict):
    req = urllib.request.Request(
        url,
        data=json.dumps(body).encode("utf-8"),
        method="PUT",
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req, timeout=60) as resp:
            return resp.status, json.loads(resp.read().decode("utf-8"))
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read().decode("utf-8"))


@pytest.mark.parametrize(
    "input_path", sorted(glob.glob(f"{FLAT_IN}/*.json"))
)
def test_flat_corpus_against_live_server(server_url, input_path):
    with open(input_path) as f:
        content = json.load(f)
    with open(input_path.replace("input", "output")) as f:
        desired = json.load(f)
    _, got = _put(f"{server_url}/api/anonymization/flatjson", content)
    assert got == desired, input_path


def test_jsonld_error_cases_against_live_server(server_url):
    for name in ["01-missing-parameter", "02-invalid-url"]:
        with open(f"{LD_IN}/{name}.json") as f:
            content = json.load(f)
        with open(f"{LD_IN.replace('input', 'output')}/{name}.json") as f:
            desired = json.load(f)
        status, got = _put(f"{server_url}/api/anonymization", content)
        assert got == desired, name
        assert status in (400, 404)


def test_success_status_is_202(server_url):
    with open(f"{FLAT_IN}/11-maksing.json") as f:
        content = json.load(f)
    status, _ = _put(f"{server_url}/api/anonymization/flatjson", content)
    assert status == 202


def test_unknown_route_404_and_bad_json_400(server_url):
    status, body = _put(f"{server_url}/api/nope", {})
    assert status == 404
    req = urllib.request.Request(
        f"{server_url}/api/anonymization/flatjson",
        data=b"{not json",
        method="PUT",
    )
    try:
        with urllib.request.urlopen(req, timeout=30):
            raise AssertionError("expected 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400
