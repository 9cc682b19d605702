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

import ast
import json
import re
from collections.abc import Callable, Sequence
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


#: The forced tool schema of the reference (function_generator.py:51-73):
#: one function, ``return_python``, returning step-by-step reasoning plus
#: the synthesized function source.
RETURN_PYTHON_TOOL = {
    "type": "function",
    "function": {
        "name": "return_python",
        "description": "output of reasoning and python code",
        "parameters": {
            "type": "object",
            "properties": {
                "reasoning": {
                    "type": "string",
                    "description": "The step-by-step reason for the output",
                },
                "python_code": {
                    "type": "string",
                    "description": "Python function string that transform input to output",
                },
            },
            "required": ["reasoning", "python_code"],
        },
    },
}


@dataclass
class OpenAICompatibleClient:
    """Live client against any OpenAI-compatible chat-completions API.

    Mirrors the reference protocol exactly (function_generator.py:44-92):
    the ``return_python`` tool is forced via ``tool_choice``, sampling is
    temperature 0.2 / seed 42 / stream False, and the function source is
    pulled from ``tool_calls[0].function.arguments``. ``base_url`` lets
    the same client target any compatible serving endpoint (vLLM,
    llama.cpp server, a gateway) — the reference's client is hard-wired
    to one vendor.

    ``transport`` is the wire boundary: a callable mapping the request
    payload (chat-completions JSON body) to the response payload
    (decoded JSON). It defaults to a stdlib urllib POST to
    ``{base_url}/chat/completions``; tests inject recorded payloads here
    and exercise the real request builder + response parser with zero
    network.
    """

    model: str = "gpt-4-turbo-preview"
    temperature: float = 0.2
    seed: int = 42
    base_url: str | None = None
    api_key: str | None = None
    transport: Callable[[dict], dict] | None = None

    def build_request(self, messages: Sequence[dict[str, str]]) -> dict:
        """The exact request the reference sends (forced tool call,
        temperature 0.2, seed 42, stream False)."""
        return {
            "model": self.model,
            "messages": list(messages),
            "tools": [RETURN_PYTHON_TOOL],
            "tool_choice": {"type": "function", "function": {"name": "return_python"}},
            "stream": False,
            "temperature": self.temperature,
            "seed": self.seed,
        }

    def parse_response(self, payload: dict) -> str:
        """G2 over the wire format: prefer the forced tool call's
        ``python_code`` argument (reference response_parser,
        function_generator.py:88-92 — which ``ast.literal_eval``s the
        arguments string; JSON is tried first, the literal_eval fallback
        covers servers that emit Python-literal dicts), else fall back
        to fenced/bare code in ``message.content``."""
        message = payload["choices"][0]["message"]
        calls = message.get("tool_calls") or []
        if calls:
            arguments_str = calls[0]["function"]["arguments"]
            try:
                arguments = json.loads(arguments_str)
            except ValueError:
                arguments = ast.literal_eval(arguments_str)
            return str(arguments["python_code"]).strip()
        return extract_code(message.get("content") or "")

    def _default_transport(self, payload: dict) -> dict:
        import urllib.request

        base = (self.base_url or "https://api.openai.com/v1").rstrip("/")
        headers = {"Content-Type": "application/json"}
        if self.api_key:
            headers["Authorization"] = f"Bearer {self.api_key}"
        req = urllib.request.Request(
            f"{base}/chat/completions",
            data=json.dumps(payload).encode("utf-8"),
            headers=headers,
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=120) as resp:
            return json.loads(resp.read().decode("utf-8"))

    def complete(self, messages: Sequence[dict[str, str]]) -> str:
        transport = self.transport or self._default_transport
        return self.parse_response(transport(self.build_request(messages)))


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
