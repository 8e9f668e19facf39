from chaq_sdfgen_tpu.cli import main
import sys

sys.exit(main())
