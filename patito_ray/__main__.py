import sys

from patito_ray.cli import main

sys.exit(main())
