"""SSML processing: tag parsing + say-as interpretation -> plain text + breaks.

Behavioral parity: reference `TTS/SSML/SSMLProcessor.swift:10` + TagParser +
SayAsInterpreter (410 LoC): <speak>, <break time>, <say-as interpret-as=
characters|digits|cardinal|ordinal|telephone|date>, <sub alias>, <emphasis>,
<prosody rate>. Output: text segments with break durations for the
synthesizer to stitch.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from fluidaudio_tpu.tts.text_normalizer import number_to_words, ordinal_to_words


@dataclass
class SsmlSegment:
    text: str
    break_after_seconds: float = 0.0
    rate: float = 1.0  # prosody rate multiplier


# attribute values may be single- OR double-quoted (both are valid XML)
_TAG_RE = re.compile(
    r"<(/?)([a-zA-Z-]+)((?:\s+[a-zA-Z-]+=(?:\"[^\"]*\"|'[^']*'))*)\s*(/?)>"
)
_ATTR_RE = re.compile(r"([a-zA-Z-]+)=(?:\"([^\"]*)\"|'([^']*)')")


def _parse_time(value: str) -> float:
    value = value.strip()
    if value.endswith("ms"):
        return float(value[:-2]) / 1000.0
    if value.endswith("s"):
        return float(value[:-1])
    return 0.0


def interpret_say_as(text: str, interpret_as: str, fmt: str = "") -> str:
    text = text.strip()
    if interpret_as in ("characters", "spell-out"):
        return " ".join(c.upper() if c.isalpha() else _digit(c) for c in text if not c.isspace())
    if interpret_as in ("digits", "telephone"):
        return " ".join(_digit(c) for c in text if c.isdigit())
    if interpret_as == "cardinal":
        return number_to_words(int(re.sub(r"\D", "", text) or 0))
    if interpret_as == "ordinal":
        return ordinal_to_words(int(re.sub(r"\D", "", text) or 0))
    if interpret_as == "date":
        return _interpret_date(text, fmt)
    return text


def _digit(c: str) -> str:
    return number_to_words(int(c)) if c.isdigit() else c


_MONTHS = ["january", "february", "march", "april", "may", "june", "july",
           "august", "september", "october", "november", "december"]


def _interpret_date(text: str, fmt: str) -> str:
    parts = re.split(r"[-/.]", text)
    if len(parts) == 3:
        if fmt in ("mdy", ""):
            if fmt == "mdy" or len(parts[0]) <= 2:
                m, d, y = parts
            else:  # year-first input with no format: y-m-d
                y, m, d = parts
        elif fmt == "dmy":
            d, m, y = parts
        elif fmt == "ymd":
            y, m, d = parts
        else:
            return text
        try:
            month = _MONTHS[int(m) - 1]
            from fluidaudio_tpu.tts.text_normalizer import year_to_words

            return f"{month} {ordinal_to_words(int(d))} {year_to_words(int(y))}"
        except (ValueError, IndexError):
            return text
    return text


class SSMLProcessor:
    def process(self, ssml: str) -> list[SsmlSegment]:
        """Parse an SSML (or plain-text) string into synthesizable segments."""
        if "<" not in ssml:
            return [SsmlSegment(text=ssml.strip())] if ssml.strip() else []

        segments: list[SsmlSegment] = []
        current = []
        rate_stack = [1.0]
        say_as_stack: list[tuple[str, str]] = []
        sub_alias: list[str] = []
        pos = 0

        def flush(break_s: float = 0.0):
            text = "".join(current).strip()
            current.clear()
            if text or break_s:
                segments.append(SsmlSegment(text=text, break_after_seconds=break_s,
                                            rate=rate_stack[-1]))

        for m in _TAG_RE.finditer(ssml):
            chunk = ssml[pos : m.start()]
            if chunk:
                if sub_alias:
                    pass  # <sub> content ignored; alias emitted at close
                elif say_as_stack:
                    kind, fmt = say_as_stack[-1]
                    current.append(interpret_say_as(chunk, kind, fmt))
                else:
                    current.append(chunk)
            pos = m.end()
            closing, tag, attr_str, selfclose = m.groups()
            attrs = {
                am.group(1): am.group(2) if am.group(2) is not None else am.group(3)
                for am in _ATTR_RE.finditer(attr_str or "")
            }
            tag = tag.lower()
            if tag == "break":
                flush(_parse_time(attrs.get("time", "0.5s")))
            elif tag == "say-as":
                if closing:
                    if say_as_stack:
                        say_as_stack.pop()
                else:
                    say_as_stack.append(
                        (attrs.get("interpret-as", ""), attrs.get("format", ""))
                    )
            elif tag == "sub":
                if closing:
                    if sub_alias:
                        current.append(sub_alias.pop())
                else:
                    sub_alias.append(attrs.get("alias", ""))
            elif tag == "prosody":
                if closing:
                    if len(rate_stack) > 1:
                        flush()
                        rate_stack.pop()
                else:
                    flush()
                    rate_stack.append(_parse_rate(attrs.get("rate", "medium")))
            # <speak>, <emphasis>, unknown tags: text passes through

        tail = ssml[pos:]
        if tail and not sub_alias:
            current.append(tail)
        flush()
        return [s for s in segments if s.text or s.break_after_seconds]


def _parse_rate(value: str) -> float:
    named = {"x-slow": 0.6, "slow": 0.8, "medium": 1.0, "fast": 1.25, "x-fast": 1.5}
    if value in named:
        return named[value]
    if value.endswith("%"):
        try:
            return float(value[:-1]) / 100.0
        except ValueError:
            return 1.0
    try:
        return float(value)
    except ValueError:
        return 1.0
