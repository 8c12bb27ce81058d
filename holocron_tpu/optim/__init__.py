from . import wrapper
from .adabelief import AdaBelief, adabelief
from .adamp import AdamP, adamp
from .adan import Adan, adan
from .ademamix import AdEMAMix, ademamix
from .lamb import LAMB, lamb
from .lars import LARS, lars
from .ralars import RaLars, ralars
from .tadam import TAdam, tadam
from .wrapper import Lookahead, Scout, lookahead, scout

__all__ = [
    "AdEMAMix",
    "AdaBelief",
    "AdamP",
    "Adan",
    "LAMB",
    "LARS",
    "Lookahead",
    "RaLars",
    "Scout",
    "TAdam",
    "adabelief",
    "adamp",
    "adan",
    "ademamix",
    "lamb",
    "lars",
    "lookahead",
    "ralars",
    "scout",
    "tadam",
]
