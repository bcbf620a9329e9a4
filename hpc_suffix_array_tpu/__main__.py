from hpc_suffix_array_tpu.cli import main
import sys

sys.exit(main())
