import sys

from cuda_ldpc_tpu.cli import main

sys.exit(main())
