"""Push notifier: post per-(event, handler) results to Slack.

Mirror of the reference's ``SlackNotifier`` (``/root/reference/
notifier.go:27-137``): chat.postMessage with a Bearer bot token, the text
being ``Result.message()`` (success/failure format parity lives on the
Result class, ``plans/handlers.py``), optional ``icon_emoji``/``username``
omitted from the JSON when empty, errors surfaced for HTTP >= 400 and for
``{"ok": false}`` API responses.

The HTTP transport is injected (an ``opener`` callable with the
``urllib.request.urlopen`` signature), so the contract test runs a fake
transport exactly like the reference's fake round-tripper
(``notifier_test.go:15-68``) — no real network anywhere in CI. Notifiers
plug straight into ``Registry(notify=...)``: ``SlackNotifier.notify`` has
the required ``Callable[[Result], None]`` shape."""

from __future__ import annotations

import json
import urllib.error
import urllib.request
from dataclasses import dataclass, field
from typing import Any, Callable

SLACK_POST_MESSAGE_URL = "https://slack.com/api/chat.postMessage"


@dataclass
class SlackNotifier:
    channel: str
    token: str
    icon_emoji: str = ""
    username: str = ""
    # transport seam (notifier.go:41 HTTPClient); defaults to real urllib
    opener: Callable[..., Any] = field(default=urllib.request.urlopen)

    def notify(self, result) -> None:
        """Post ``result.message()`` to the channel; raises RuntimeError on
        transport/API failure (the reference returns the wrapped error and
        the caller logs it — ``handler.go:89-95``)."""
        payload: dict[str, str] = {
            "channel": self.channel,
            "text": result.message(),
        }
        if self.icon_emoji:
            payload["icon_emoji"] = self.icon_emoji
        if self.username:
            payload["username"] = self.username
        req = urllib.request.Request(
            SLACK_POST_MESSAGE_URL,
            data=json.dumps(payload).encode("utf-8"),
            headers={
                "Content-Type": "application/json",
                "Authorization": f"Bearer {self.token}",
            },
            method="POST",
        )
        try:
            resp = self.opener(req)
            status = getattr(resp, "status", 200)
            body = resp.read()
        except urllib.error.HTTPError as e:
            # the default urllib opener RAISES on HTTP >= 400 (HTTPError is
            # an OSError subclass, so this must be caught first — ADVICE
            # r3); route it through the status branch below so the real
            # transport produces the reference's "failed with status code
            # %d (%s)" message with the response body (notifier.go:119-122)
            status, body = e.code, e.read()
        except OSError as e:  # connection-level failure
            raise RuntimeError(f"slack postMessage failed: {e}") from e
        if status >= 400:
            raise RuntimeError(
                f"slack webhook request failed with status code {status} ({body!r})"
            )
        try:
            parsed = json.loads(body)
        except ValueError as e:
            raise RuntimeError(f"failed to unmarshal response body: {e}") from e
        if not parsed.get("ok"):
            raise RuntimeError(f"failed to send message: {parsed.get('error')}")
