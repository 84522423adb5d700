"""Job-completion webhook sink (SURVEY.md §2.1 S9).

Mirrors the reference's callback notifier (``cv_api/main.py:199-220``
``_notify_callback_if_needed``): once a job reaches a terminal state, POST
the job summary as JSON to the caller-supplied callback URL with a bounded
timeout, and record a delivery receipt ``{attempted_at, ok, status_code,
error}`` next to the job's other state — errors are data, never raised, so
a dead callback endpoint can't fail a finished 100 TB run.

Driver-side by design: exactly one notification per job, fired by the job
runner (``run.py``) after the manifest commits, never from inside Ray tasks
(N tasks × M retries of outbound POSTs is a thundering herd; the reference
likewise notifies once per job from the orchestrator, not per page).
Transport is stdlib ``urllib`` — no third-party HTTP client needed.
"""

from __future__ import annotations

import json
import os
import time
import urllib.error
import urllib.request


def notify_callback(
    callback_url: str, payload: dict, *, timeout: float = 10.0
) -> dict:
    """POST ``payload`` as JSON to ``callback_url``; return a delivery
    receipt, never raise (reference: cv_api/main.py:204-219 — the receipt
    fields ``attempted_at/ok/status_code/error`` match it exactly).

    2xx → ok=True; any other status → ok=False with the code recorded;
    transport errors (refused, timeout, bad URL) → ok=False with the error
    string recorded.
    """
    receipt: dict = {
        "attempted_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "ok": False,
        "status_code": None,
        "error": None,
    }
    body = json.dumps(payload, default=str).encode("utf-8")
    req = urllib.request.Request(
        callback_url,
        data=body,
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            receipt["status_code"] = int(resp.status)
            receipt["ok"] = 200 <= resp.status < 300
    except urllib.error.HTTPError as exc:  # non-2xx still yields a code
        receipt["status_code"] = int(exc.code)
    except Exception as exc:  # noqa: BLE001 — transport failure is data
        receipt["error"] = str(exc)
    return receipt


def record_delivery(out_dir: str, receipt: dict) -> str:
    """Persist the delivery receipt beside the job manifest (the reference
    stores it on the job row via ``_update_job(callback_delivery=...)``;
    here the manifest dir is the job row). Returns the path written."""
    mdir = os.path.join(out_dir, "_manifest")
    os.makedirs(mdir, exist_ok=True)
    path = os.path.join(mdir, "notification.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(receipt, f)
    os.replace(tmp, path)
    return path
