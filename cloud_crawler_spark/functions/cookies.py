"""Cookie store (P7) and deterministic user-agent families (P8).

CookieStore re-expresses the reference's WEBrick-backed store
(cookie_store.rb:32-55; spec/cookie_store_spec.rb:26-47): construct
from a name->value mapping, ``merge`` an HTTP ``Set-Cookie`` header
string (possibly several cookies comma-joined), and render the
``Cookie`` request header with expired cookies filtered
(cookie_store.rb:27-29 ``expired?``). The store itself is a plain
driver/worker-side object: in the Spark engine one instance lives per
(partition, host) inside the live-fetch UDF — the analog of the
reference's per-HTTP-client jar (http.rb:196 merges Set-Cookie after
every response).

``agent_for`` re-expresses mozilla_agents.rb:33-54's six UA template
families, but SEEDED: the reference draws from ``rand`` per client,
which would break this engine's determinism guarantee (same seeds +
budget => same crawl), so the family and version draws come from a
``random.Random`` keyed by (seed, host) — random-looking, distinct
across hosts, reproducible across runs and parallelism levels
(SURVEY §2 P8 note).
"""

from __future__ import annotations

import random
import re
from dataclasses import dataclass, field
from datetime import datetime, timezone
from email.utils import parsedate_to_datetime
from typing import Optional

#: attribute names that can never START a new cookie after a comma
_ATTRS = {"expires", "path", "domain", "max-age", "secure", "httponly", "samesite"}

#: split a Set-Cookie header that carries several cookies: a comma
#: starts a new cookie only when followed by token=... before any ';'
#: (an Expires date's embedded comma is followed by the date words,
#: which contain no '=')
_COOKIE_SPLIT = re.compile(r",(?=[^;,]*=)")


@dataclass
class Cookie:
    name: str
    value: str
    path: Optional[str] = None
    domain: Optional[str] = None
    expires: Optional[datetime] = None
    attrs: dict = field(default_factory=dict)

    def expired(self, now: Optional[datetime] = None) -> bool:
        """cookie_store.rb:27-29: ``!!expires && expires < Time.now``."""
        if self.expires is None:
            return False
        now = now or datetime.now(timezone.utc)
        exp = self.expires
        if exp.tzinfo is None:
            exp = exp.replace(tzinfo=timezone.utc)
        return exp < now


def parse_set_cookie(header: str) -> list[Cookie]:
    """Parse a Set-Cookie header (one or more comma-joined cookies)
    into Cookie objects — WEBrick ``parse_set_cookies`` analog. A
    malformed chunk is skipped (the reference rescues and keeps going,
    cookie_store.rb:40-49)."""
    out: list[Cookie] = []
    for chunk in _COOKIE_SPLIT.split(header or ""):
        parts = [p.strip() for p in chunk.split(";") if p.strip()]
        if not parts or "=" not in parts[0]:
            continue
        name, _, value = parts[0].partition("=")
        name = name.strip()
        if not name or name.lower() in _ATTRS:
            continue
        c = Cookie(name=name, value=value.strip().strip('"'))
        for attr in parts[1:]:
            k, _, v = attr.partition("=")
            k = k.strip().lower()
            v = v.strip()
            if k == "expires":
                try:
                    c.expires = parsedate_to_datetime(v)
                except (TypeError, ValueError):
                    pass
            elif k == "path":
                c.path = v
            elif k == "domain":
                c.domain = v
            else:
                c.attrs[k] = v if v else True
        out.append(c)
    return out


class CookieStore:
    """Dict-like jar of Cookie objects (cookie_store.rb:32-55)."""

    def __init__(self, cookies: Optional[dict] = None):
        self._cookies: dict[str, Cookie] = {}
        if cookies:
            for name, value in cookies.items():
                self._cookies[name] = Cookie(name=name, value=value)

    def merge(self, set_cookie_str: Optional[str]) -> "CookieStore":
        """Merge a Set-Cookie header; later cookies win by name
        (cookie_store.rb:40-49 merge!)."""
        if set_cookie_str:
            for c in parse_set_cookie(set_cookie_str):
                self._cookies[c.name] = c
        return self

    def to_s(self, now: Optional[datetime] = None) -> str:
        """Cookie request-header value: ``name=value`` joined with ';',
        expired cookies dropped (cookie_store.rb:51-53)."""
        return ";".join(
            f"{c.name}={c.value}"
            for c in self._cookies.values()
            if not c.expired(now)
        )

    # dict-ish surface the reference gets from DelegateClass(Hash)
    def __getitem__(self, name: str) -> Cookie:
        return self._cookies[name]

    def __contains__(self, name: str) -> bool:
        return name in self._cookies

    def __len__(self) -> int:
        return len(self._cookies)

    def empty(self) -> bool:
        return not self._cookies

    def keys(self):
        return self._cookies.keys()


# --- P8: user-agent families (mozilla_agents.rb:33-54) --------------

def _firefox_mac(r: random.Random) -> str:
    return (
        f"Mozilla/5.0 (Macintosh; Intel Mac OS X 10.8; "
        f"rv:{10 + r.randrange(10)}.{r.randrange(10)}) "
        f"Gecko/20{10 + r.randrange(3)}{1000 + r.randrange(3) * 100 + r.randrange(28)} "
        f"Firefox/20.0"
    )


def _firefox_linux(r: random.Random) -> str:
    return (
        f"Mozilla/5.0 (X11; U; Linux x86_64; en-US; rv:1.9.2.{10 + r.randrange(10)}) "
        f"Gecko/20{10 + r.randrange(3)}{1000 + r.randrange(3) * 100 + r.randrange(28)} "
        f"Ubuntu/10.10 (maverick) Firefox/3.6.{14 + r.randrange(5)}"
    )


def _chrome_win(r: random.Random) -> str:
    ver = f"{400 + r.randrange(99)}.{10 + r.randrange(75)}"
    return (
        f"Mozilla/5.0 (Windows NT 6.1; WOW64) AppleWebKit/{ver} "
        f"(KHTML, like Gecko) Chrome/12.0.{700 + r.randrange(90)}."
        f"{100 + r.randrange(200)} Safari/{ver}"
    )


def _chrome_linux(r: random.Random) -> str:
    ver = f"{400 + r.randrange(99)}.{r.randrange(9)}"
    return (
        f"Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/{ver} "
        f"(KHTML, like Gecko) Chrome/13.0.{700 + r.randrange(90)}."
        f"{100 + r.randrange(200)} Safari/{ver}"
    )


def _firefox_win(r: random.Random) -> str:
    return (
        f"Mozilla/5.0 (Windows NT 6.1; WOW64; rv:5.0) "
        f"Gecko/20{10 + r.randrange(3)}{1000 + r.randrange(3) * 100 + r.randrange(28)} "
        f"Firefox/{4 + r.randrange(1)}.0"
    )


def _msie(r: random.Random) -> str:
    return (
        f"Mozilla/4.0 (compatible; MSIE 8.{r.randrange(6)}; Windows NT 6.1; WOW64; "
        f"Trident/4.0; SLCC2; .NET CLR 2.0.{50000 + r.randrange(7000)}; "
        f".NET CLR 3.5.{30000 + r.randrange(8000)}; "
        f".NET CLR 3.0.{30000 + r.randrange(8000)}; Media Center PC 6.0; "
        f".NET4.0C; .NET4.0E; MS-RTC LM 8; Zune 4.{6 + r.randrange(3)})"
    )


_FAMILIES = (_firefox_mac, _firefox_linux, _chrome_win, _chrome_linux,
             _firefox_win, _msie)


def random_agent(rng: random.Random) -> str:
    """One UA string drawn from the six families (mozilla_agents.rb:33-54)."""
    return _FAMILIES[rng.randrange(len(_FAMILIES))](rng)


def agent_for(seed: int, key: str = "") -> str:
    """Deterministic UA for a (seed, key) pair — same inputs, same
    agent, on any executor. ``key`` is the per-host scope in the fetch
    stage (one agent per host per crawl, like the reference's one
    agent per HTTP client)."""
    return random_agent(random.Random(f"{seed}:{key}"))


def random_agents(seed: int, num: int = 10) -> list[str]:
    """mozilla_agents.rb:58-60 random_agents, seeded."""
    return [agent_for(seed, str(i)) for i in range(num)]
