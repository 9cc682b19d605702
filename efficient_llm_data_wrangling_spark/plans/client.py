"""Pluggable LLM clients for function synthesis (G1/G2 —
fast_ai_wrangler/function_generator.py:44-92).

The default everywhere in this repo is :class:`OfflineStubClient` — a
deterministic, network-free client that serves golden function sources
from fixtures — so tests and the correctness driver never depend on an
API. :class:`OpenAICompatibleClient` is the live path, configured like
the reference (temperature 0.2, seed 42, function_generator.py:77-84);
it is import-gated and never constructed implicitly.
"""

from __future__ import annotations

import re
from collections.abc import Sequence
from dataclasses import dataclass, field
from typing import Protocol


class LLMClient(Protocol):
    """One call per synthesis/repair iteration: messages → code string."""

    def complete(self, messages: Sequence[dict[str, str]]) -> str: ...


_CODE_FENCE = re.compile(r"```(?:python)?\n(.*?)```", re.DOTALL)


def extract_code(response: str) -> str:
    """G2 — pull the python source out of a model response (the
    reference forces a tool call and ast.literal_evals the arguments,
    function_generator.py:88-92; we accept fenced or bare code)."""
    match = _CODE_FENCE.search(response)
    return (match.group(1) if match else response).strip()


@dataclass
class OfflineStubClient:
    """Deterministic offline synthesis: replay scripted responses.

    ``responses`` is consumed in order; the last entry repeats forever
    (so a script of [bad, good] exercises exactly one repair loop).
    """

    responses: Sequence[str]
    calls: list[list[dict[str, str]]] = field(default_factory=list)

    def complete(self, messages: Sequence[dict[str, str]]) -> str:
        self.calls.append(list(messages))
        idx = min(len(self.calls) - 1, len(self.responses) - 1)
        return self.responses[idx]


@dataclass
class OpenAICompatibleClient:
    """Live client against any OpenAI-compatible chat-completions API.

    Reference config (function_generator.py:77-84): temperature 0.2,
    seed 42. Requires the ``openai`` package and an API key in the
    environment; not used by tests or the driver. ``base_url`` lets the
    same client target any compatible serving endpoint (vLLM, llama.cpp
    server, a gateway) — the reference's client is hard-wired to one
    vendor.
    """

    model: str = "gpt-4-turbo-preview"
    temperature: float = 0.2
    seed: int = 42
    base_url: str | None = None
    api_key: str | None = None

    def complete(self, messages: Sequence[dict[str, str]]) -> str:
        try:
            from openai import OpenAI
        except ImportError as exc:  # pragma: no cover
            raise RuntimeError(
                "OpenAICompatibleClient needs the 'openai' package; use "
                "OfflineStubClient for network-free runs"
            ) from exc
        kwargs: dict[str, str] = {}
        if self.base_url:
            kwargs["base_url"] = self.base_url
        if self.api_key:
            kwargs["api_key"] = self.api_key
        client = OpenAI(**kwargs)
        out = client.chat.completions.create(
            model=self.model,
            messages=list(messages),
            temperature=self.temperature,
            seed=self.seed,
        )
        return extract_code(out.choices[0].message.content or "")


def client_from_env(env=None) -> LLMClient | None:
    """G9 live-path gate: build an :class:`OpenAICompatibleClient` from
    the environment iff ``ELLDW_LLM_MODEL`` is set (endpoint/key via
    ``ELLDW_LLM_BASE_URL`` / ``ELLDW_LLM_API_KEY``, falling back to the
    ``openai`` package's own env handling). Returns ``None`` when not
    opted in — callers default to :class:`OfflineStubClient` fixtures,
    so no test, bench, or driver run ever touches the network."""
    import os

    env = os.environ if env is None else env
    model = env.get("ELLDW_LLM_MODEL")
    if not model:
        return None
    return OpenAICompatibleClient(
        model=model,
        base_url=env.get("ELLDW_LLM_BASE_URL"),
        api_key=env.get("ELLDW_LLM_API_KEY"),
    )
