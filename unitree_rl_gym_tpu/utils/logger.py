"""Play-time state/reward aggregation (reference: utils/logger.py:5-39)."""

from __future__ import annotations

from collections import defaultdict

import numpy as np


class Logger:
    def __init__(self, dt):
        self.state_log = defaultdict(list)
        self.rew_log = defaultdict(list)
        self.dt = dt
        self.num_episodes = 0

    def log_state(self, key, value):
        self.state_log[key].append(value)

    def log_states(self, d):
        for key, value in d.items():
            self.log_state(key, value)

    def log_rewards(self, d, num_episodes):
        for key, value in d.items():
            if "rew" in key:
                self.rew_log[key].append(float(np.asarray(value)) * num_episodes)
        self.num_episodes += num_episodes

    def reset(self):
        self.state_log.clear()
        self.rew_log.clear()

    def print_rewards(self):
        print("Average rewards per second:")
        for key, values in self.rew_log.items():
            mean = np.sum(np.array(values)) / max(self.num_episodes, 1)
            print(f" - {key}: {mean}")
        print(f"Total number of episodes: {self.num_episodes}")

    def print_states(self):
        """Aggregate tracking/state series logged via log_states (the
        reference plots these, utils/logger.py:13-31; headless TPU hosts
        get the numeric summary instead)."""
        if not self.state_log:
            return
        print("State summary (mean over logged steps):")
        for key, values in self.state_log.items():
            arr = np.asarray(values, dtype=np.float64)
            print(f" - {key}: mean {arr.mean():.4f}  std {arr.std():.4f}")
