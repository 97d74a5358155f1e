#define VERSION "0.14-oracle"
#define HAVE_STRCHRNUL 1
#define HAVE_REALLOCARRAY 1
