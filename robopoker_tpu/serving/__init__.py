"""Serving/applications layer: policies, live engine, litmus, AIVAT,
slumbot client, HTTP API (ref: crates/{parlor,portal,litmus,arena,spar})."""

from . import aivat, api, litmus, parlor, policy, slumbot
from .aivat import Aivat, AivatDelta, HandRecord
from .parlor import Engine, HandResult
from .policy import Agent, Blueprint, Resolver, Witness, dirac, sample, zoo
from .slumbot import Benchmark, Runtime, Session

__all__ = [
    "aivat", "api", "litmus", "parlor", "policy", "slumbot",
    "Aivat", "AivatDelta", "HandRecord", "Engine", "HandResult",
    "Agent", "Blueprint", "Resolver", "Witness", "dirac", "sample", "zoo",
    "Benchmark", "Runtime", "Session",
]
