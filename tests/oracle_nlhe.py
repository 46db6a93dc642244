"""Independent pure-Python N-seat NLHE rules oracle.

A direct transcription of the reference's game-state semantics
(ref: crates/kicker/src/game.rs — turn/legal/act/next_player/
is_everyone_* predicates, to_call/to_raise/to_shove amounts, showdown
settlement) used as the differential-test oracle for the batched TPU
engine in robopoker_tpu/kicker. Deliberately object-style/sequential —
the opposite shape from the array engine — so shared bugs are unlikely.
"""

from __future__ import annotations

import dataclasses

from robopoker_tpu.pokerkit.constants import B_BLIND, S_BLIND, STACK

from .oracle_evaluator import packed as hand_strength

BETTING, FOLDING, SHOVING = 0, 1, 2
PREF, FLOP, TURN, RIVER = 0, 1, 2, 3

# actions: ("fold",), ("check",), ("call", n), ("raise", n), ("shove", n),
#          ("blind", n), ("draw", cards)


@dataclasses.dataclass
class Seat:
    cards: tuple
    stack: int = STACK
    stake: int = 0
    spent: int = 0
    state: int = BETTING


@dataclasses.dataclass
class Game:
    seats: list
    board: list
    pot: int = 0
    dealer: int = 0
    ticker: int = 0

    @classmethod
    def preblind(cls, holes, dealer=0, stacks=None):
        if stacks is None:
            stacks = (STACK,) * len(holes)
        return cls(
            seats=[Seat(cards=tuple(h), stack=s) for h, s in zip(holes, stacks)],
            board=[], dealer=dealer,
            ticker=0 if len(holes) == 2 else 1,  # ref: game.rs:59-67
        )

    @classmethod
    def root(cls, holes, dealer=0, stacks=None):
        g = cls.preblind(holes, dealer, stacks)
        g.act(g.posts())
        g.act(g.posts())
        return g

    # --- positions ---------------------------------------------------------
    def actor_idx(self):
        return (self.dealer + self.ticker) % len(self.seats)

    def actor(self):
        return self.seats[self.actor_idx()]

    def street(self):
        return {0: PREF, 3: FLOP, 4: TURN, 5: RIVER}[len(self.board)]

    def max_stake(self):
        return max(s.stake for s in self.seats)

    # --- predicates (ref game.rs:481-531) ----------------------------------
    def is_everyone_touched(self):
        P = len(self.seats)
        offset = 1 if P == 2 else 2  # ref: game.rs:489-493
        return self.ticker > P + (offset if self.street() == PREF else 0)

    def is_everyone_matched(self):
        stake = self.max_stake()
        return all(s.stake == stake for s in self.seats if s.state == BETTING)

    def is_everyone_calling(self):
        return self.is_everyone_touched() and self.is_everyone_matched()

    def is_everyone_shoving(self):
        return all(s.state == SHOVING for s in self.seats if s.state != FOLDING)

    def is_everyone_folding(self):
        return sum(1 for s in self.seats if s.state != FOLDING) == 1

    def is_everyone_alright(self):
        return (
            self.is_everyone_calling()
            or self.is_everyone_folding()
            or self.is_everyone_shoving()
        )

    def must_stop(self):
        if self.street() == RIVER:
            return self.is_everyone_alright()
        return self.is_everyone_folding()

    def must_deal(self):
        return self.street() != RIVER and self.is_everyone_alright()

    def must_post(self):
        return self.street() == PREF and self.pot < S_BLIND + B_BLIND

    def turn(self):
        if self.must_stop():
            return "terminal"
        if self.must_deal():
            return "chance"
        return ("choice", self.actor_idx())

    # --- amounts (ref game.rs:537-607) --------------------------------------
    def to_call(self):
        return self.max_stake() - self.actor().stake

    def to_post(self):
        if self.pot < S_BLIND:
            return min(S_BLIND, self.actor().stack)
        return min(B_BLIND, self.actor().stack)

    def to_shove(self):
        return self.actor().stack

    def to_raise(self):
        stakes = sorted(
            (s.stake for s in self.seats if s.state != FOLDING), reverse=True
        ) + [0, 0]
        most, nxt = stakes[0], stakes[1]
        relative = most - self.actor().stake
        marginal = most - nxt
        return relative + max(marginal, B_BLIND)

    def may_fold(self):
        return self.turn()[0] == "choice" and self.to_call() > 0

    def may_call(self):
        return (
            self.turn()[0] == "choice"
            and self.may_fold()
            and self.to_call() < self.to_shove()
        )

    def may_check(self):
        return self.turn()[0] == "choice" and self.max_stake() == self.actor().stake

    def may_raise(self):
        return self.turn()[0] == "choice" and self.to_raise() < self.to_shove()

    def may_shove(self):
        return self.turn()[0] == "choice" and self.to_shove() > 0

    def posts(self):
        return ("blind", self.to_post())

    def legal(self):
        """Ordered as the reference's legal(): raise, shove, call, fold, check."""
        if self.must_stop():
            return []
        if self.must_deal():
            return [("draw", None)]
        if self.must_post():
            return [self.posts()]
        out = []
        if self.may_raise():
            out.append(("raise", self.to_raise()))
        if self.may_shove():
            out.append(("shove", self.to_shove()))
        if self.may_call():
            out.append(("call", self.to_call()))
        if self.may_fold():
            out.append(("fold",))
        if self.may_check():
            out.append(("check",))
        return out

    # --- transitions (ref game.rs:387-478) ----------------------------------
    def next_player(self):
        if not self.is_everyone_alright():
            while True:
                self.ticker += 1
                if self.actor().state == BETTING:
                    break

    def next_street(self):
        for s in self.seats:
            s.stake = 0

    def bet(self, chips):
        assert self.actor().stack >= chips, (chips, self.actor())
        self.pot += chips
        a = self.actor()
        a.stack -= chips
        a.stake += chips
        a.spent += chips
        if a.stack == 0:
            a.state = SHOVING

    def act(self, action, cards=None):
        kind = action[0]
        if kind == "check":
            self.next_player()
        elif kind == "fold":
            self.actor().state = FOLDING
            self.next_player()
        elif kind in ("call", "blind", "raise", "shove"):
            self.bet(action[1])
            self.next_player()
        elif kind == "draw":
            assert cards is not None
            self.ticker = 0
            self.board.extend(cards)
            self.next_player()
            self.next_street()
        else:
            raise ValueError(action)

    def apply(self, action, cards=None):
        import copy

        g = copy.deepcopy(self)
        g.act(action, cards)
        return g

    # --- settlement (ref showdown.rs Showdown::settle) ------------------------
    def settlements(self):
        """Returns per-seat PnL (chips won − spent), any seat count.

        Direct transcription of the reference's tiered loop: strongest
        live tier first; within a tier, ascending winner all-in levels;
        each layer pot = every seat's clipped contribution; equal split
        with odd chips to the earliest winners in seat order."""
        assert self.must_stop()
        P = len(self.seats)
        spent = [s.spent for s in self.seats]
        alive = [i for i, s in enumerate(self.seats) if s.state != FOLDING]
        if len(alive) == 1:
            w = alive[0]
            return [self.pot - spent[w] if i == w else -spent[i]
                    for i in range(P)]
        strengths = [
            hand_strength([int(c) for c in s.cards]
                          + [int(b) for b in self.board])
            if s.state != FOLDING else -1
            for i, s in enumerate(self.seats)
        ]
        rewards = tiered_rewards(spent, [s.state == FOLDING
                                         for s in self.seats], strengths)
        return [rewards[i] - spent[i] for i in range(P)]


def tiered_rewards(spent, folded, strengths):
    """Reference Showdown::settle tier loop (ref: showdown.rs) as a
    standalone function over (risked, folded, strength) triples."""
    P = len(spent)
    alive = [i for i in range(P) if not folded[i]]
    rewards = [0] * P
    best = None
    distributing = 0
    while True:
        cands = [strengths[i] for i in alive
                 if best is None or strengths[i] < best]
        if not cands:
            break
        best = max(cands)
        while True:
            distributed = distributing
            winners = [i for i in alive
                       if strengths[i] == best and spent[i] > distributed]
            if not winners:
                break
            distributing = min(spent[i] for i in winners)
            chips = sum(max(0, min(sp, distributing) - distributed)
                        for sp in spent)
            share, bonus = divmod(chips, len(winners))
            for j, i in enumerate(winners):
                rewards[i] += share + (1 if j < bonus else 0)
    return rewards
