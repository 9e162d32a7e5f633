"""robots.txt parsing (RFC 9309, Robots Exclusion Protocol).

The crawl-frontier complement to the sitemap kernel: every fetcher in
a web-scale pipeline consults these, and corpus audits need the
aggregate facts (which hosts disallow everything, advertised sitemaps,
crawl delays). Standalone kernel + dedicated query, same posture as
structdata.py — the text dispatcher is untouched (robots.txt is plain
text with no magic; the crawl layer knows the URL).

Semantics implemented from the RFC and the de-facto extensions it
acknowledges: groups are runs of user-agent lines followed by rules;
comments strip at '#'; matching is per-group longest-path elsewhere
(we only collect, not match); `crawl-delay` and `sitemap` are the two
universal extensions (sitemap lines are GLOBAL, not group-scoped).
Unknown directives count but never fail; the parse never raises on
content.
"""

from __future__ import annotations

from dataclasses import dataclass, field

_MAX_LINES = 100_000


@dataclass
class RobotsGroup:
    agents: list[str] = field(default_factory=list)
    allows: list[str] = field(default_factory=list)
    disallows: list[str] = field(default_factory=list)
    crawl_delay: float | None = None


@dataclass
class RobotsResult:
    groups: list[RobotsGroup] = field(default_factory=list)
    sitemaps: list[str] = field(default_factory=list)
    n_unknown_directives: int = 0
    truncated: bool = False

    def group_for(self, agent: str) -> RobotsGroup | None:
        """Longest-user-agent-substring match per RFC 9309 §2.2.1,
        falling back to '*'."""
        agent = agent.lower()
        best: tuple[int, RobotsGroup] | None = None
        star: RobotsGroup | None = None
        for g in self.groups:
            for a in g.agents:
                if a == "*":
                    star = star or g
                elif a in agent and (best is None or len(a) > best[0]):
                    best = (len(a), g)
        return best[1] if best else star

    def disallows_all(self, agent: str = "*") -> bool:
        g = self.group_for(agent)
        return bool(g) and "/" in g.disallows and not g.allows


def parse_robots(text: str) -> RobotsResult:
    res = RobotsResult()
    cur: RobotsGroup | None = None
    last_was_agent = False
    for i, raw in enumerate(text.splitlines()):
        if i >= _MAX_LINES:
            res.truncated = True
            break
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not last_was_agent or cur is None:
                cur = RobotsGroup()
                res.groups.append(cur)
            cur.agents.append(val.lower())
            last_was_agent = True
            continue
        last_was_agent = False
        if key == "sitemap":
            if val:
                res.sitemaps.append(val)
        elif cur is None:
            # rules before any user-agent line: RFC says undefined;
            # count them as unknown rather than invent a group
            res.n_unknown_directives += 1
        elif key == "disallow":
            if val:
                cur.disallows.append(val)
            # empty Disallow means "allow all" — a rule line, not junk
        elif key == "allow":
            if val:
                cur.allows.append(val)
        elif key == "crawl-delay":
            try:
                cur.crawl_delay = float(val)
            except ValueError:
                res.n_unknown_directives += 1
        else:
            res.n_unknown_directives += 1
    return res
