// Force-included when compiling the (unmodified) reference sources:
// they call unqualified isnan(), which modern libstdc++ only provides
// as std::isnan.
#include <cmath>
using std::isnan;
