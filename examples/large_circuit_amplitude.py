"""40-qubit circuit amplitude through the lazy einsum IR with slicing."""


import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import tensorcircuit_ng_tpu as tc
from tensorcircuit_ng_tpu.core import contractor as ctr

n = 40
c = tc.Circuit(n)
c.h(0)
for i in range(n - 1):
    c.cnot(i, i + 1)

if __name__ == "__main__":
    print("GHZ amp(1...1):", complex(np.asarray(c.amplitude("1" * n))))
    ir = c.amplitude_before("0" * n)
    print("contraction info:", ctr.contraction_info(ir))
